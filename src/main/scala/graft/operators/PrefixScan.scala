package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed prefix scan — the 100 TB realization of a grouped running sum
  * that the window-function form (`sum over (partition by g order by k)`)
  * states declaratively but executes by sorting EVERY group on ONE task: at
  * corpus scale the hot language IS most of the data, so that single sort is
  * the scale killer the token-budget / sequence-packing scaladoc warns about.
  *
  * The same result computes with bounded per-task sorts by splitting each
  * group's ordered run into RANGE BUCKETS derived from the sort key itself
  * (`bucket = hk div (keyspace/numRanges)` — a pure function of the row, so
  * no physical-partition coupling, no sampling, no driver round-trip, and
  * deterministic under AQE/recomputation):
  *
  *   1. local running sums within (group, bucket) — a window whose partitions
  *      are ~1/numRanges of each group, so the hot group's sort spreads
  *      across numRanges tasks (numRanges scales with the cluster);
  *   2. per-(group, bucket) subtotals — one aggregation to a metadata-sized
  *      table (groups × numRanges rows);
  *   3. bucket offsets — a cumulative window over THAT tiny table (sorting
  *      groups × numRanges rows, never data), broadcast-joined back;
  *   4. `cum = offset + local running sum`.
  *
  * Equality with the single-window form holds because the bucket is monotone
  * in the sort key: ordering by (bucket, hk, id) ≡ ordering by (hk, id).
  * Spec-proven on skewed data, and the realization is registered under the
  * SAME DuckDB oracle as the window form, so the driver checks both against
  * one truth.
  */
object PrefixScan {

  /** Session conf key overriding the range-bucket count; unset, the count
    * tracks `spark.sql.shuffle.partitions` — the same knob that already
    * encodes the cluster's parallelism, so a 1000-executor session spreads
    * the hot group over ~its task slots without a second tuning surface.
    */
  val NumRangesConfKey = "spark.graft.prefixScan.numRanges"

  /** Bucket count for the current session: the [[NumRangesConfKey]] override,
    * else `spark.sql.shuffle.partitions`. A CONSTANT here would silently pin
    * the hot group's spread to a value chosen for one cluster size.
    */
  def configuredNumRanges(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption(NumRangesConfKey)
      .getOrElse(spark.conf.get("spark.sql.shuffle.partitions", "8")).toInt

  /** [[langTokenCumsum]] with the bucket count from the session conf. */
  def langTokenCumsum(s: DataFrame): DataFrame =
    langTokenCumsum(s, configuredNumRanges(s.sparkSession))

  /** Grouped running token sum over (lang_id, hk, doc_id, n_tokens) rows:
    * returns (doc_id, lang_id, n_tokens, cum_tokens) where cum_tokens is the
    * within-language running total in (hk, doc_id) order. `hk` must lie in
    * [0, 2⁶⁰) — the md5-derived [[TextDedup.tokenHash60]] domain. The result
    * is numRanges-invariant (bucketing is monotone in the sort key), so the
    * bucket count is purely a parallelism knob — spec-proven at 1 and 64.
    */
  def langTokenCumsum(s: DataFrame, numRanges: Int): DataFrame = {
    require(numRanges >= 1 && numRanges <= (1 << 20),
      s"numRanges must be in [1, 2^20], got $numRanges")
    val width = (1L << 60) / numRanges
    val rows = s.select(col("lang_id"), col("hk").cast("long"),
        col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .withColumn("bucket", expr(s"hk div $width"))

    val wLocal = Window.partitionBy("lang_id", "bucket")
      .orderBy(col("hk").asc, col("doc_id").asc)
    val local = rows.withColumn("local_cum", sum(col("n_tokens")).over(wLocal))

    val sub = rows.groupBy("lang_id", "bucket").agg(sum(col("n_tokens")).as("tot"))
    val wOff = Window.partitionBy("lang_id").orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sub.select(col("lang_id"), col("bucket"),
      coalesce(sum(col("tot")).over(wOff), lit(0L)).as("off"))

    local.join(broadcast(offsets), Seq("lang_id", "bucket"))
      .select(col("doc_id"), col("lang_id"), col("n_tokens"),
        (col("off") + col("local_cum")).as("cum_tokens"))
  }
}
