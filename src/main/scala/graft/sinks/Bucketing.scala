package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table materialization — the shuffle-elimination story for joins
  * that repeat at 100 TB.
  *
  * A fact-to-fact equi-join (lineitem ⋈ orders on the order key) shuffles
  * BOTH sides every time it runs; neither fits a broadcast. Writing each
  * table bucketed by the join key hashes rows into a fixed number of
  * per-partition files ONCE, at write time — after which every join (and
  * aggregation) on that key reads co-located buckets and plans with ZERO
  * exchanges: the nightly pipeline pays the shuffle once instead of per
  * query. This is Spark's native analogue of the reference's co-partitioning
  * contract (its CDC topics are keyed by `receipt_id` at ingest so the Kafka
  * Streams joins need no repartition topic — README.md:74-80); the same
  * design decision, moved from topic keying to table layout.
  *
  * Sort-by within buckets additionally lets sort-merge join skip its sort.
  * Bucket counts must match across the joined tables (Spark requires it to
  * line buckets up one-to-one); pick the count once per subject area and
  * size it so a bucket fits an executor's memory at the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally bucket-sorted) table at an
    * explicit path. Bucketing metadata lives in the catalog — readers must go
    * through `spark.table(name)`, not `spark.read.parquet(path)` (a raw path
    * read loses the layout contract and re-shuffles).
    */
  def writeBucketed(df: DataFrame, name: String, path: String, buckets: Int,
                    keys: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty)
    val w = df.write.mode(SaveMode.Overwrite).option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Equi-join two bucketed tables on their (shared) bucket key — plans with
    * no shuffle exchange on either side when both tables are bucketed on
    * `keys` with equal bucket counts.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
