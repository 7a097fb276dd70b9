package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Debug tap (SURVEY.md §2 #6): the reference `peek`s records to a logger
  * (TokenBalance.java:123,271,332). The Spark-idiomatic equivalent is plan
  * observation — named aggregates attached in-flight with zero data change
  * and no per-row side effects (a `foreach` logger would break whole-stage
  * codegen). Batch callers read the [[Observation]] after an action;
  * streaming callers get the metrics in each `StreamingQueryProgress`.
  */
object Taps {

  /** Row-count tap. */
  def tap(df: DataFrame, obs: Observation): DataFrame =
    df.observe(obs, count(lit(1)).as("rows"))

  /** Arbitrary-metric tap (e.g. sum of amounts, max event time). */
  def tap(df: DataFrame, obs: Observation, metrics: Column*): DataFrame =
    df.observe(obs, metrics.head, metrics.tail: _*)

  /** Streaming variant: named metrics surface in StreamingQueryProgress. */
  def tapStream(df: DataFrame, name: String, metrics: Column*): DataFrame =
    df.observe(name, metrics.head, metrics.tail: _*)
}
