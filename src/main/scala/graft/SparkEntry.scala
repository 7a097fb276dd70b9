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

  /** Sessions must read `events.parquet` (parquet TIMESTAMP(NANOS)); Spark only
    * accepts it as a long with this legacy conf — it is a runtime SQLConf, so
    * setting it here also covers driver-created sessions.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
