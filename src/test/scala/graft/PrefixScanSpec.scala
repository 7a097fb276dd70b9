package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixScan

/** The bucketed grouped prefix scan must equal the window-function form on
  * any input — including when one group dominates (the case the scan exists
  * for) and the group's run genuinely spans several range buckets.
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_id").orderBy(col("hk").asc, col("doc_id").asc)
    df.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select("doc_id", "lang_id", "n_tokens", "cum_tokens")
  }

  test("equals the window form on skewed synthetic data across many buckets") {
    // one hot group (90%) + two small ones; hash keys spread over the full
    // 2^60 domain so the hot group's ordered run crosses bucket boundaries
    val mask = (1L << 60) - 1
    val rows = (0 until 3000).map { i =>
      val lang = if (i % 10 < 9) "hot" else if (i % 2 == 0) "aa" else "zz"
      (i.toLong, lang, (i * 37 % 101 + 1).toLong, (i * 1181783497276652981L) & mask)
    }
    val df = rows.toDF("doc_id", "lang_id", "n_tokens", "hk")
    // the scan must actually be multi-bucket for this to prove anything
    val nBuckets = df.select(expr(s"hk div ${(1L << 60) / 8}")).distinct().count()
    assert(nBuckets > 4, s"synthetic keys span only $nBuckets buckets")
    val got = PrefixScan.langTokenCumsum(df, numRanges = 8)
      .as[(Long, String, Long, Long)].collect().toSet
    val want = windowForm(df).as[(Long, String, Long, Long)].collect().toSet
    assert(got === want)
  }

  /** numRanges is a pure parallelism knob: the degenerate single-bucket form
    * (≡ the window plan) and a 64-way spread must both equal the window form
    * on the same skewed data — the invariance that lets the bucket count
    * track cluster size (spark.sql.shuffle.partitions) instead of a constant.
    */
  test("result is numRanges-invariant at the extremes (1 and 64) on skewed data") {
    val mask = (1L << 60) - 1
    val rows = (0 until 3000).map { i =>
      val lang = if (i % 10 < 9) "hot" else if (i % 2 == 0) "aa" else "zz"
      (i.toLong, lang, (i * 37 % 101 + 1).toLong, (i * 1181783497276652981L) & mask)
    }
    val df = rows.toDF("doc_id", "lang_id", "n_tokens", "hk")
    val want = windowForm(df).as[(Long, String, Long, Long)].collect().toSet
    Seq(1, 64).foreach { nr =>
      val got = PrefixScan.langTokenCumsum(df, numRanges = nr)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === want, s"numRanges=$nr diverged from the window form")
    }
  }

  test("bucket count follows the session conf override, else shuffle partitions") {
    assert(PrefixScan.configuredNumRanges(spark) ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    spark.conf.set(PrefixScan.NumRangesConfKey, "64")
    try assert(PrefixScan.configuredNumRanges(spark) === 64)
    finally spark.conf.unset(PrefixScan.NumRangesConfKey)
  }

  test("equals the window form on the harness documents") {
    val t = col("text")
    val s = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.langId(t).as("lang_id"),
        graft.functions.TextFunctions.tokenCount(t).cast("long").as("n_tokens"),
        graft.operators.TextDedup.tokenHash60(col("doc_id").cast("string")).as("hk"))
    val got = PrefixScan.langTokenCumsum(s)
      .as[(Long, String, Long, Long)].collect().toSet
    val want = windowForm(s).as[(Long, String, Long, Long)].collect().toSet
    assert(got === want)
  }
}
