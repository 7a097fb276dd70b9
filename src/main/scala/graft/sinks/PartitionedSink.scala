package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned columnar output for 100 TB-scale results.
  *
  * Two knobs matter at scale and both are easy to get wrong silently:
  * partition layout (consumers prune by the partition column — e.g. a date
  * derived from event time — instead of scanning everything) and file sizing
  * (`maxRecordsPerFile` bounds the largest file; without it one hot partition
  * writes a single multi-GB file that downstream readers cannot split across
  * row groups they didn't get). `sortWithinPartitions` on the ordering keys
  * gives per-file clustering — the scale-safe form of the reference's global
  * ordering contract (SURVEY.md §2 #10): consumers of one partition read in
  * order and merge across partitions by the same keys.
  */
object PartitionedSink {

  /** Write `df` partitioned by a derived date column, size-bounded files,
    * rows clustered by `orderCols` within each file.
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsMicrosCol: String,
                           orderCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("dt", to_date(timestamp_micros(col(tsMicrosCol))))
      .sortWithinPartitions(col("dt") +: orderCols.map(col): _*)
      .write
      .partitionBy("dt")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
