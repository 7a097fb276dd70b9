package graft

import graft.queries.CurationQueries

/** The distributed capped water-filling allocation must equal an independent
  * SEQUENTIAL fixpoint search (try every prefix length p of the r-sorted
  * sources, keep the one whose implied water level is consistent on both
  * sides), and satisfy the allocation's defining properties — feasibility,
  * cap-respect, and a non-trivial capped/uncapped split on harness data.
  */
class MixtureCappedSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def rows =
    CurationQueries.mixtureCapped(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .map { case (lang, n, cap, capped, alloc, e6) =>
        (lang, n, cap, capped == 1L, alloc, e6)
      }

  /** Sequential reference: exhaustive prefix fixpoint over the r-sorted
    * sources (the formulation the distributed pointwise test was verified
    * against in prototyping — here it guards the production query forever).
    */
  private def reference(src: Seq[(String, Long, Long)], budget: Long): Map[String, Long] = {
    val withW = src
      .map { case (l, n, cap) => (l, n, math.floor(math.sqrt(n.toDouble)).toLong, cap) }
      .sortBy { case (l, _, w, cap) => (cap.toDouble / w, l) }
    val valid = (0 to withW.size).flatMap { p =>
      val (capped, free) = withW.splitAt(p)
      val prem = budget - capped.map(_._4).sum
      val wr = free.map(_._3).sum
      val ok =
        if (wr == 0) prem >= 0
        else prem >= 0 &&
          capped.forall { case (_, _, w, cap) => cap * wr <= prem * w } &&
          free.forall { case (_, _, w, cap) => cap * wr > prem * w }
      if (ok) Some(p) else None
    }
    assert(valid.nonEmpty, "no consistent water level found")
    val p = valid.last
    val (capped, free) = withW.splitAt(p)
    val prem = budget - capped.map(_._4).sum
    val wr = free.map(_._3).sum
    (capped.map { case (l, _, _, cap) => l -> cap } ++
      free.map { case (l, _, w, _) => l -> prem * w / wr }).toMap
  }

  test("distributed allocation equals the sequential fixpoint exactly") {
    val got = rows
    val src = got.map { case (l, n, cap, _, _, _) => (l, n, cap) }
    val total = got.map(_._2).sum
    val budget = total * 18 / 10
    val expect = reference(src, budget)
    got.foreach { case (l, _, _, _, alloc, _) =>
      assert(alloc === expect(l), s"$l: got $alloc expected ${expect(l)}")
    }
  }

  test("allocation is feasible, cap-respecting, and non-trivially split") {
    val got = rows
    val budget = got.map(_._2).sum * 18 / 10
    got.foreach { case (l, n, cap, capped, alloc, e6) =>
      assert(cap === CurationQueries.MixtureCapEpochs * n)
      assert(alloc <= cap, s"$l allocated past its cap")
      assert(capped === (alloc == cap) || !capped, s"$l capped flag vs alloc")
      assert(e6 === alloc * 1000000L / n)
    }
    val total = got.map(_._5).sum
    val nFree = got.count(!_._4)
    assert(total <= budget, "over budget")
    // each uncapped source's floor loses < 1 token-unit, so the water
    // filling spends all but < nFree of the budget
    if (nFree > 0) assert(budget - total < nFree.toLong,
      s"unspent budget ${budget - total} exceeds flooring slack")
    assert(got.exists(_._4) && got.exists(!_._4),
      "harness constants no longer produce both branches — re-tune the budget factor")
  }
}
