package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness's deterministic parquet testdata (TESTDATA.md).
  *
  * Note: `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark only
  * reads with `spark.sql.legacy.parquet.nanosAsLong=true` — every session in
  * this project sets it, so `ts` surfaces as an epoch-nanosecond LongType.
  * That exactly mirrors the reference's nanosecond-decimal block timestamps
  * (reference: up.sql:213, Schemas.java:59-70) and keeps full precision;
  * `graft.schema.NearSchemas.eventTime` derives a µs TimestampType when stream
  * time is needed.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every harness table as a temp view, so the whole engine is
    * reachable from pure SQL (`spark.sql("SELECT … FROM lineitem …")`) —
    * combined with the SQL function injection in
    * [[graft.GraftExtensions]] / `GraftFunctions.register`, a SQL-only user
    * gets the same surface the DataFrame API exposes.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
