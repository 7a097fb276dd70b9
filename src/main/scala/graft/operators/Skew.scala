package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale.
  *
  * Spark's own defenses cover most cases — hash aggregates do map-side partial
  * aggregation, and AQE splits skewed shuffle-join partitions
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). The two gaps these
  * helpers close:
  *
  *   - [[saltedJoin]]: a large fact side with a hot key joined against a
  *     dimension too big to broadcast. The hot key's rows all land in one
  *     task; AQE can split the partition but not the key. Salting shards the
  *     key `saltBuckets` ways: the fact side gets a deterministic salt from
  *     non-key columns, the dimension side is replicated once per salt value.
  *   - [[saltedDistinctCount]]: `count(DISTINCT x)` per hot key — the
  *     two-phase (salted partial → final) decomposition, since distinct
  *     aggregation cannot map-side combine.
  *
  * Window functions over a hot partition key (flagged for the sessionize /
  * running-window queries) have no transparent rewrite — the documented
  * mitigation is to bound partitions by composite keys (e.g. (user, day))
  * which the tumbling/sessionize queries already do via time bucketing.
  */
object Skew {

  /** Equi-join `facts ⋈ dim` on `key`, sharding each key `saltBuckets` ways.
    * Results are identical to the plain join (verified by the spec); the salt
    * on the fact side is derived deterministically from `saltSource` (pick a
    * high-cardinality column, e.g. an event id) so replays are stable.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, saltBuckets: Int): DataFrame = {
    val salted = facts.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key exact distinct count in two shuffles, neither keyed by the hot
    * key alone: (key, value) partial-distinct first, then count per key.
    * Equivalent to `groupBy(key).agg(count_distinct(value))`.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
                          resultName: String): DataFrame =
    df.select(col(key), col(value))
      .distinct() // shuffle on (key, value) — hot key spreads over buckets
      .groupBy(col(key))
      // count(value) skips the surviving (key, NULL) row, matching
      // count(DISTINCT value)'s NULL semantics, while an all-NULL key still
      // yields its group row with count 0.
      .agg(count(col(value)).as(resultName))
}
