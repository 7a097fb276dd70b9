package graft

import org.apache.spark.sql.functions._

import graft.sources.Events

/** The schema-adaptive event-time accessor must produce the SAME epoch-µs
  * integer for the same instant under every physical encoding it supports —
  * the harness only ships one encoding at a time (NTZ since round 8), so the
  * other branches are pinned here: legacy ns-as-long (with floor semantics on
  * pre-1970 values — DuckDB floors, `DIV` truncates toward zero),
  * TIMESTAMP_NTZ (the current harness reality, via the UTC-pinned cast), and
  * TIMESTAMP.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  // epoch-µs instants incl. pre-1970 and non-multiples of 1000 ns
  private val micros = Seq(0L, 1L, -1L, 1700000000000000L, -1700000000000001L)

  test("all three ts encodings yield identical epoch-us values") {
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(Events.tsMicros(df).as("us")).as[Long].collect().toSeq.sorted

    val ltz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val ntz = ltz.select(col("ts").cast("timestamp_ntz").as("ts"))
    // legacy encoding: the same instants as ns longs, with sub-µs noise the
    // floor must strip (999 ns shifts no value across a µs boundary)
    val legacy = micros.map(us => us * 1000 + 999).toDF("ts")
    assert(vals(ltz) === micros.sorted)
    assert(vals(ntz) === micros.sorted)
    assert(vals(legacy) === micros.sorted)
  }

  test("legacy ns-long branch floors (DuckDB semantics), incl. pre-1970") {
    // ns values that are NOT multiples of 1000: -1 ns is 1 ns before epoch →
    // floor µs is -1 (truncation toward zero would say 0)
    val ns = Seq(-1L, -999L, -1000L, -1001L, 999L, 1000L, 1500L)
    val df = ns.toDF("ts")
    val got = df.select(col("ts"), Events.tsMicros(df).as("us"))
      .as[(Long, Long)].collect().toMap
    val want = ns.map(n => n -> Math.floorDiv(n, 1000L)).toMap
    assert(got === want)
  }

  test("tsNanos is exactly micros times 1000 under every encoding") {
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val got = ntz.select(Events.tsNanos(ntz).as("ns")).as[Long].collect().sorted.toSeq
    assert(got === micros.map(_ * 1000L).sorted)
  }
}
