package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.FreqSketch

/** Misra-Gries sketch semantics: the superset guarantee (every item above
  * n/(k+1) survives), the undercount bound, both under arbitrary
  * reduce/merge splits — the properties the exact-heavy-hitters query's
  * correctness argument rests on — plus the end-to-end two-pass query shape
  * on a Dataset.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(agg: FreqSketch, xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(r.passed, r.status.toString)
  }

  // small alphabet + skewed draws so heavy hitters actually occur
  private val gen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.const("warm"),
      3 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.chooseNum(0, 500).map("rare" + _)))

  test("property: serial reduce keeps every item above n/(k+1), undercount bounded") {
    val k = 8
    val agg = new FreqSketch(k)
    check(Prop.forAll(gen) { xs: List[String] =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = sketchOf(agg, xs)
      val bound = xs.size.toLong / (k + 1)
      val superset = truth.collect { case (t, c) if c > bound => t }
        .forall(sk.contains)
      val undercount = sk.forall { case (t, c) =>
        val tc = truth(t); c <= tc && tc - c <= bound
      }
      superset && undercount && sk.size <= k
    })
  }

  test("property: guarantee holds across arbitrary merge splits") {
    val k = 8
    val agg = new FreqSketch(k)
    check(Prop.forAll(gen, Gen.chooseNum(0, 100)) { (xs: List[String], cutSeed: Int) =>
      val cut = if (xs.size <= 1) 0 else cutSeed % xs.size
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(sketchOf(agg, l), sketchOf(agg, r))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.size.toLong / (k + 1)
      val superset = truth.collect { case (t, c) if c > bound => t }
        .forall(merged.contains)
      val undercount = merged.forall { case (t, c) => c <= truth(t) }
      superset && undercount && merged.size <= k
    })
  }

  test("two-pass dataset query: sketch candidates + exact verify = exact heavy hitters") {
    val words =
      List.fill(400)("the") ++ List.fill(120)("of") ++ List.fill(30)("walrus") ++
        (1 to 450).map("unique" + _)
    val ds = spark.sparkContext.parallelize(scala.util.Random.shuffle(words), 7).toDS
    val n = words.size.toLong
    val cand = ds.groupByKey(_ => 0)
      .agg(new FreqSketch(16).column)
      .flatMap(_._2.map(_._1)).collect().toSet
    // exact heavy hitters at 3%: "the", "of", "walrus"
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 100 >= 3 * n }.keySet
    assert(truth.subsetOf(cand))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val verified = cand.toList.map(t => t -> exact(t))
      .filter { case (_, c) => c * 100 >= 3 * n }.map(_._1).toSet
    assert(verified === truth)
  }
}
