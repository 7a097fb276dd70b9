package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alon–Matias–Szegedy signed-counter sketches (STOC'96) — the one-pass
  * join-size/skew statistics a planner prices joins with. Shared by the
  * batch gates (`q_ams_selfjoin`, `q_ams_join`) and the streaming monitor
  * ([[graft.streaming.AmsMetrics]]): the counter build is a DECLARATIVE plan
  * (one md5 projection + [[Estimators]] conditional sums), so the identical
  * code runs as a batch aggregation or an update-mode streaming aggregation
  * with 16 longs of state — sums are commutative/associative, which is the
  * whole reason AMS streams.
  *
  * Estimator j's sign is hex digit j of ONE md5 digest per row (16 nibbles
  * of a 128-bit hash — the practical "split one strong hash" family; the
  * digest lives in its own projection so it is computed once, never per
  * estimator). E[Zⱼ²] = F₂ = self-join size; E[Zᵒⱼ·Zˡⱼ] = |⋈| under shared
  * signs. All integers end to end.
  */
object Ams {

  /** Estimator count — enough that the estimator spread is itself visible
    * data (gated tables carry all 16 rows, not a pre-digested median).
    */
  val Estimators = 16

  /** The wide one-row counter form: z1..z16 from a global aggregation over
    * `keys` (one column `k`). Valid on batch AND streaming frames — the
    * streaming monitor's entire state is this row.
    *
    * Sign extraction is TWO 32-bit hex parses per row plus integer bit
    * tests, not 16 per-nibble `substring`+`conv` string parses (measured:
    * that form cost ~2× on the sf0.1 orders⋈lineitem gate). Nibble j's sign
    * bit is its high bit, so sign_j = 1 − 2·bit_j and Zⱼ = n − 2·Σ bit_j —
    * identical values, and the Σ-of-bits form keeps the aggregation 16
    * single-bit integer sums (a projection computes the z's after the agg,
    * which is equally legal on the streaming plan). 16 hex chars would
    * overflow a signed long under ANSI, hence the two-halves parse.
    */
  def zWide(keys: DataFrame): DataFrame = {
    val v = keys.select(md5(col("k").cast("string")).as("h"))
      .select(
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("v1"),
        conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("v2"))
    def bit(j: Int) =
      if (j <= 8) shiftright(col("v1"), 4 * (8 - j) + 3).bitwiseAND(lit(1L))
      else shiftright(col("v2"), 4 * (16 - j) + 3).bitwiseAND(lit(1L))
    val aggs = count(lit(1)).as("n") +:
      (1 to Estimators).map(j => sum(bit(j)).as(s"b$j"))
    v.agg(aggs.head, aggs.tail: _*)
      .select((1 to Estimators).map(j =>
        (col("n") - lit(2L) * col(s"b$j")).as(s"z$j")): _*)
  }

  /** Unpivot a wide counter row to (j, z) — batch-side (a Generate over one
    * row; snapshots of the streaming monitor go through the same helper).
    */
  def unpivot(wide: DataFrame): DataFrame =
    wide.select(expr(s"stack($Estimators, " +
      (1 to Estimators).map(j => s"${j}L, z$j").mkString(", ") +
      ") AS (j, z)"))

  /** Batch counters: (j, z), one row per estimator. */
  def zCounters(keys: DataFrame): DataFrame = unpivot(zWide(keys))
}
