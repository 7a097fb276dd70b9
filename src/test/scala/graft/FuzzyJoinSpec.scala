package graft

import org.apache.spark.sql.functions.col
import graft.operators.FuzzyJoin

/** The deletion-neighborhood blocked join must equal brute-force
  * all-pairs Levenshtein ≤ 1 — losslessness of the blocking is the whole
  * theorem (substitution/insertion/deletion each guarantee a shared
  * variant), and the exact verify discharges over-generation.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val words = Seq(
    "ring", "rings", "ping", "rang", "ringo",   // ins / sub / ins at end
    "bolt", "boat", "bold", "belt",             // substitution cluster
    "gizmo", "gizmos", "gizm",                  // del / ins
    "widget", "midget", "widgets",
    "a", "b", "ab", "",                         // short/empty edge cases
    "exact", "exact")                           // duplicate content, dist 0

  test("blocked pairs equal brute-force all-pairs Levenshtein <= 1") {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = FuzzyJoin.editDistance1Pairs(df, "id", "w")
      .as[(Long, Long, Long)].collect().toSet
    val expected = (for {
      i <- words.indices; j <- words.indices if i < j
      d = levenshtein(words(i), words(j)) if d <= 1
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got === expected,
      s"missing: ${expected.diff(got)}, spurious: ${got.diff(expected)}")
    // sanity on content: the duplicate pair at distance 0 and a sub at 1
    assert(expected.exists(_._3 == 0L) && expected.exists(_._3 == 1L))
  }

  test("candidate generation never plans an all-pairs stage") {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val plan = FuzzyJoin.editDistance1Pairs(df, "id", "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to all-pairs:\n$plan")
  }

  test("q_fuzzy_join finds real neighbor pairs on the harness customers") {
    val rows = graft.queries.AnalyticQueries.qFuzzyJoin(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every reported pair is a genuine distance <= 1 pair of BUILDING names
    val names = graft.sources.Tables(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name").as[(Long, String)].collect().toMap
    rows.foreach { case (a, b, d) =>
      assert(levenshtein(names(a), names(b)).toLong == d && d <= 1L)
    }
  }
}
