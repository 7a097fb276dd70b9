package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, CurationQueries, EmbeddingQueries, MediaQueries, NearQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes `(spark, sfDir)` and reads only the driver's parquet
  * testdata; `oracleSql` holds the DuckDB-runnable twin for the correctness
  * gate (column names are aligned on both sides — the driver hashes values
  * under sorted column names).
  */
object SparkEntry {

  /** Session confs every query path depends on — runtime SQLConfs, so setting
    * them here also covers driver-created sessions:
    *   - `nanosAsLong`: if the harness ships `events.ts` as parquet
    *     TIMESTAMP(NANOS) again (it did through round 7), Spark only reads it
    *     (as an epoch-ns long) with this legacy conf; the schema-adaptive
    *     [[graft.sources.Events]] accessor handles either encoding;
    *   - UTC session timezone: the NTZ→timestamp cast in `Events.tsMicros`
    *     reinterprets wall-clock fields in the session zone, and DuckDB's
    *     `epoch_ns(ts)` oracle treats naive timestamps as UTC — any other
    *     zone silently shifts every derived event time.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's full dataflow (dedup → ±2 s joins → filter → double-entry
    * fan-out) over the synthetic CDC feed.
    */
  def entry(spark: SparkSession): DataFrame =
    NearQueries.transfers(configure(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (NearQueries.queries ++ AnalyticQueries.queries ++ TextQueries.queries ++
      EmbeddingQueries.queries ++ MediaQueries.queries ++ CurationQueries.queries).map {
      case (k, f) => k -> ((s: SparkSession, dir: String) => f(configure(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    NearQueries.oracleSql ++ AnalyticQueries.oracleSql ++ TextQueries.oracleSql ++
      EmbeddingQueries.oracleSql ++ MediaQueries.oracleSql ++ CurationQueries.oracleSql
}
