package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness's deterministic parquet testdata (TESTDATA.md).
  *
  * Note: the physical type of `events.ts` has changed across harness rounds
  * (parquet TIMESTAMP(NANOS) through round 7, `timestamp[us]` NTZ since
  * round 8) — never assume it. All event-time derivation goes through the
  * schema-adaptive [[Events]] accessor, which mirrors the reference's
  * "derive event time from whatever the upstream ships" contract (reference:
  * up.sql:213, Schemas.java:59-70). Sessions still set
  * `spark.sql.legacy.parquet.nanosAsLong=true` so the legacy encoding stays
  * readable, and `spark.sql.session.timeZone=UTC` so NTZ casts are
  * value-preserving; `graft.schema.NearSchemas.eventTime` derives a µs
  * TimestampType when stream time is needed.
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
