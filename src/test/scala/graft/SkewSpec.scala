package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must never change results — only the shuffle layout. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = (1 to 1000).map { i =>
    // key "hot" carries 90% of rows
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, s"p$i")
  }.toDF("key", "event_id", "payload")

  private lazy val dim = Seq(
    ("hot", "dim-hot"), ("k0", "dim-0"), ("k3", "dim-3"), ("unmatched", "dim-x")
  ).toDF("key", "dim_val")

  test("saltedJoin equals the plain equi-join on a skewed key") {
    val plain = facts.join(dim, "key")
      .select("key", "event_id", "dim_val").as[(String, Long, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "key", col("event_id"), saltBuckets = 8)
      .select("key", "event_id", "dim_val").as[(String, Long, String)]
      .collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("saltedDistinctCount equals count_distinct per key") {
    val expected = facts.groupBy("key")
      .agg(count_distinct(col("payload")).as("n"))
      .as[(String, Long)].collect().toSet
    val got = Skew.saltedDistinctCount(facts, "key", "payload", "n")
      .as[(String, Long)].collect().toSet
    assert(got === expected)
  }

  test("saltedDistinctCount NULL semantics match count(DISTINCT): NULLs ignored, all-NULL key kept at 0") {
    val withNulls = Seq(
      ("a", Some("x")), ("a", Some("x")), ("a", None), // NULL must not count
      ("b", None), ("b", None)                         // all-NULL key -> row with 0
    ).toDF("key", "payload")
    val expected = withNulls.groupBy("key")
      .agg(count_distinct(col("payload")).as("n"))
      .as[(String, Long)].collect().toSet
    val got = Skew.saltedDistinctCount(withNulls, "key", "payload", "n")
      .as[(String, Long)].collect().toSet
    assert(got === expected)
    assert(got === Set(("a", 1L), ("b", 0L)))
  }
}
