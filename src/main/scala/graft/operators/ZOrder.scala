package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) CLUSTERING LAYOUT — multi-dimensional data placement
  * for file skipping, the dominant scan lever at 100 TB: a table laid out
  * by one sort key prunes scans on that key alone, while interleaving the
  * bits of several normalized keys places rows so that EVERY participating
  * dimension's values are locally bounded within each output file. A
  * min/max-pruned reader (parquet row groups, file-level stats) then skips
  * most of the data for a selective predicate on ANY of the clustered
  * dimensions — single-dimension layouts degrade to full scans the moment
  * the filter misses the sort key (measured in `ZOrderSpec`: a y-only
  * band predicate touches every file of an x-sorted layout and ~⅓ of the
  * z-ordered one at 16 files; the gap widens with file count as O(N) vs
  * O(√N) for 2-D boxes).
  *
  * Everything here is composed from codegen'd built-ins (shifts and
  * bitwise ops — the classic magic-mask bit spread), so the z-value rides
  * whole-stage codegen; layout itself is `repartitionByRange` on the
  * z-column + an intra-partition sort, i.e. ONE range-exchange at write
  * time, amortized across every downstream scan. No UDF, no custom
  * expression needed.
  *
  * Normalization is min/max grid scaling to [[GridBits]]-bit cells with
  * exact integer arithmetic: `((c − min) · 2^bits) div (max − min + 1)`,
  * the `div` realized as `(a − pmod(a, b)) / b` — subtracting the
  * remainder makes the double division exact (operands are integers
  * ≤ 2^53; the quotient is an integer ≤ 2^bits), so Spark and the DuckDB
  * oracle (integer `//`) agree bit-for-bit. ANSI-safe bound: the scaled
  * product needs `(max − min) · 2^bits < 2^53`, i.e. a key span below
  * ~2^37 at 16 grid bits — documented, not checked per row (the harness
  * keys are far inside it; a 100 TB deployment normalizes via per-column
  * stats the same way).
  */
object ZOrder {

  /** Grid resolution per dimension: 16 bits = 65,536 cells. Two spread
    * 16-bit coordinates interleave into a 32-bit z-value; resolution
    * beyond the realistic file count (2^32 cells ≫ any layout's file
    * count) buys nothing, and 16 bits keeps every intermediate far from
    * the 2^53 exactness bound shared with the oracle.
    */
  val GridBits: Int = 16

  // the 64-bit magic masks of the classic bit spread (x | x<<s) & m —
  // decimal because the DuckDB oracle repeats them and older DuckDB hex
  // literal support is version-dependent
  private val M16 = 281470681808895L     // 0x0000FFFF0000FFFF
  private val M8 = 71777214294589695L    // 0x00FF00FF00FF00FF
  private val M4 = 1085102592571150095L  // 0x0F0F0F0F0F0F0F0F
  private val M2 = 3689348814741910323L  // 0x3333333333333333
  private val M1 = 6148914691236517205L  // 0x5555555555555555

  /** Spread the low 32 bits of a nonnegative long into the even bit
    * positions (bit i → bit 2i): five shift-or-mask steps, all codegen'd
    * built-ins. Input must be < 2^32 (grid coordinates are ≤ 2^[[GridBits]]).
    */
  def spreadBits(c: Column): Column = {
    val s16 = c.bitwiseOR(shiftleft(c, 16)).bitwiseAND(lit(M16))
    val s8 = s16.bitwiseOR(shiftleft(s16, 8)).bitwiseAND(lit(M8))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(M4))
    val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(M2))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(M1))
  }

  /** Morton-interleave two nonnegative grid coordinates: `x`'s bits to the
    * even positions, `y`'s to the odd. Total order over the z-curve.
    */
  def interleave(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Min/max grid scaling of `c` (long-typed) onto `[0, 2^bits)`:
    * `((c − mn) · 2^bits) div (mx − mn + 1)`, exact integer semantics (see
    * object scaladoc for the pmod realization and the 2^53 span bound).
    * A constant column (mx = mn) maps to cell 0.
    */
  def gridCoord(c: Column, mn: Column, mx: Column, bits: Int = GridBits): Column = {
    val a = (c - mn).cast("long") * lit(1L << bits)
    val b = (mx - mn).cast("long") + lit(1L)
    ((a - pmod(a, b)) / b).cast("long")
  }

  /** The z-value of two raw long columns under min/max grid normalization —
    * the column both the layout writer and `q_zorder_layout` cluster on.
    */
  def zValue(x: Column, mnx: Column, mxx: Column,
             y: Column, mny: Column, mxy: Column): Column =
    interleave(gridCoord(x, mnx, mxx), gridCoord(y, mny, mxy))

  // 3-way spread masks (bit i → bit 3i, 21-bit capacity — GridBits=16 is
  // well inside); decimal for the same DuckDB-literal reason as above
  private val N32 = 8725724278095871L     // 0x001F00000000FFFF
  private val N16 = 8725728556220671L     // 0x001F0000FF0000FF
  private val N8 = 1157144660301377551L   // 0x100F00F00F00F00F
  private val N4 = 1207822528635744451L   // 0x10C30C30C30C30C3
  private val N2 = 1317624576693539401L   // 0x1249249249249249

  /** Spread the low 21 bits of a nonnegative long into every THIRD bit
    * position (bit i → bit 3i) — the 3-D interleave's per-dimension half,
    * five shift-or-mask steps like [[spreadBits]].
    */
  def spreadBits3(c: Column): Column = {
    val s32 = c.bitwiseOR(shiftleft(c, 32)).bitwiseAND(lit(N32))
    val s16 = s32.bitwiseOR(shiftleft(s32, 16)).bitwiseAND(lit(N16))
    val s8 = s16.bitwiseOR(shiftleft(s16, 8)).bitwiseAND(lit(N8))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(N4))
    s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(N2))
  }

  /** Morton-interleave THREE nonnegative grid coordinates (x → bits 3i,
    * y → 3i+1, p → 3i+2): clustering layouts are rarely 2-D in practice —
    * a fact table is typically clustered on 3–4 query dimensions — and the
    * z-curve generalizes where the per-file min/max story is unchanged:
    * every participating dimension's extent is bounded per file.
    */
  def interleave3(x: Column, y: Column, p: Column): Column =
    spreadBits3(x)
      .bitwiseOR(shiftleft(spreadBits3(y), 1))
      .bitwiseOR(shiftleft(spreadBits3(p), 2))

  /** The 3-D z-value of three raw long columns under min/max grid
    * normalization — [[zValue]]'s arity-3 sibling (48-bit code at
    * [[GridBits]]=16).
    */
  def zValue3(x: Column, mnx: Column, mxx: Column,
              y: Column, mny: Column, mxy: Column,
              p: Column, mnp: Column, mxp: Column): Column =
    interleave3(gridCoord(x, mnx, mxx), gridCoord(y, mny, mxy),
      gridCoord(p, mnp, mxp))

  /** The HILBERT-curve value of two raw long columns under the same min/max
    * grid normalization — the alternative clustering curve. The Hilbert
    * curve is contiguous (every step moves one grid cell, where the Morton
    * curve jumps at quadrant boundaries), so equal-size curve ranges tile
    * into tighter 2-D boxes and a min/max-pruned band predicate touches
    * fewer files — priced against the z-layout in `ZOrderSpec` and gated as
    * data by `q_hilbert_prune` beside `q_zorder_prune`. The transform is a
    * native codegen expression ([[graft.functions.HilbertIndexExpression]]);
    * everything else (scaling, write path, stats) is shared with z-order.
    */
  def hilbertValue(x: Column, mnx: Column, mxx: Column,
                   y: Column, mny: Column, mxy: Column): Column =
    graft.functions.HilbertIndexExpression.hilbertIndex(
      gridCoord(x, mnx, mxx), gridCoord(y, mny, mxy), GridBits)

  /** Write `df` clustered along `zCol` into `nFiles` range-partitioned,
    * internally sorted parquet files: ONE range exchange (sampled
    * boundaries, so files are row-balanced even under z-skew) plus an
    * in-partition sort — after which per-file min/max of every clustered
    * dimension is tight, which is exactly what min/max-pruned readers skip
    * on. This is the write-side amortization: pay one shuffle at layout
    * time instead of a full scan per selective query.
    */
  def writeClustered(df: DataFrame, zCol: Column, nFiles: Int, path: String): Unit =
    df.repartitionByRange(nFiles, zCol)
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file layout statistics of a written directory: min/max of the
    * given dimension columns per physical file (via the `_metadata` hidden
    * column) — the exact statistics a pruning reader consults, used by the
    * spec to price z-order against a single-key sort and by operators to
    * audit an existing layout.
    */
  def fileStats(df: DataFrame, dims: Seq[String]): DataFrame =
    df.select((col("_metadata.file_path").as("file") +: dims.map(col)): _*)
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)
}
