package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic table profiling — the data-quality sweep an ingest pipeline runs
  * over every new source before it is allowed into the mixture: one row per
  * column with its null count and exact distinct cardinality (plus the row
  * count), all integers, so the whole profile is hash-checkable.
  *
  * Plan shape: ONE aggregation job over the table. Multiple distinct
  * aggregates plan through Catalyst's Expand (a #columns-way fan-out with
  * per-partition partial DEDUP before the shuffle, so shuffle volume is the
  * sum of per-partition distinct values, not #columns × rows). That is the
  * standard exact one-job profile; at 100 TB cardinalities swap to the
  * [[graft.functions.HllSketch]] estimator (same output schema, one ordinary
  * aggregate, no Expand) exactly as `q_hll_merge` demonstrates — the exact
  * form stays the oracle the estimator is priced against.
  *
  * The single profile row is then unpivoted driver-lightly with `stack` (a
  * Generate over ONE row — no per-row re-evaluation hazard).
  */
object Profile {

  /** Unpivot-first twin of [[tableProfile]] (same output, same oracle): each
    * row stacks into #columns narrow (col_name, value-string) rows, then ONE
    * groupBy(col_name) computes nulls + exact distincts. The rendering is
    * chosen per type so distinct classes are preserved exactly (floats
    * +0.0-normalized to match count_distinct's NormalizeFloatingNumbers,
    * binary hex-encoded), so the counts equal the Expand form's — spec-
    * pinned including signed zeros and the empty table. Trades the Expand's
    * (#columns+1)× fan-out of WIDE rows for a #columns× fan-out of 2-string
    * rows; parallelism is bounded by #columns on the final aggregation
    * (fine — partial distinct dedup runs map-side at full width first).
    * Measured r14 at sf0.1: 3.65 s warm vs the Expand form's 3.91 s —
    * within noise, so the Expand form stays registered (no dependence on
    * value→string rendering); either cost is inherent to #columns exact
    * distincts, and the HLL swap is the real scale lever.
    */
  def tableProfileUnpivot(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, DoubleType, FloatType}
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    requireProfilable(cols)
    def strLit(name: String): String =
      "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def ident(name: String): String = "`" + name.replace("`", "``") + "`"
    // value→string must preserve the raw column's DISTINCT classes, which
    // plain CAST does not for two cases (review catch): floats render -0.0
    // and 0.0 as different strings while count_distinct normalizes them to
    // one value (+0.0 fixes it: -0.0 + 0.0 = +0.0, NaN stays NaN), and
    // BINARY→STRING is lossy on invalid UTF-8 (hex() is injective)
    def rendered(c: String): String = df.schema(c).dataType match {
      case DoubleType | FloatType => s"CAST((${ident(c)} + 0.0) AS STRING)"
      case BinaryType => s"hex(${ident(c)})"
      case _ => s"CAST(${ident(c)} AS STRING)"
    }
    val stackArgs = cols.map(c => s"${strLit(c)}, ${rendered(c)}").mkString(", ")
    // every input row stacks into exactly one row per column, so the group
    // count IS n_rows — no second scan; the literal names frame restores
    // the one-row-per-column contract on an EMPTY table (a grouped agg
    // emits nothing on nothing — the CLAUDE.md empty-input hazard — where
    // the Expand form's global agg emits its finish row)
    val grouped = df
      .select(expr(s"stack(${cols.length}, $stackArgs) AS (col_name, v)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").isNull.cast("long")).as("n_nulls"),
        count_distinct(col("v")).as("n_distinct"))
    cols.toSeq.toDF("col_name").join(grouped, Seq("col_name"), "left")
      .select(col("col_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
  }

  /** Duplicate names and unorderable types are the two silent breakers of
    * the "ANY table" contract (review catch): `df.columns` yields duplicate
    * names twice but the stack rows share `col_name` (merging the columns'
    * stats), and `count_distinct` cannot compare unorderable types (e.g.
    * MAP columns) — fail fast on the first, document the second.
    */
  private[graft] def requireProfilable(cols: Array[String]): Unit =
    require(cols.distinct.length == cols.length,
      s"duplicate column names cannot be profiled distinctly: " +
        cols.diff(cols.distinct).distinct.mkString(", "))

  /** Cross-engine CANONICAL string rendering for profile hashing — the seam
    * that makes [[tableProfileHll]]'s estimate oracle-checkable: both engines
    * must hash the SAME string per value, and plain double→string rendering
    * is NOT cross-engine-stable (Java 17's `Double.toString` and DuckDB's
    * shortest-round-trip formatter disagree on some values, and Spark flips
    * to scientific notation at 1e7 where DuckDB does not). Per type:
    *   - integers / strings: the decimal/raw string — identical by
    *     construction;
    *   - DOUBLE/FLOAT: `round(x · 100)` as a long — exact and identical in
    *     both engines (the product is one IEEE multiply, `round` is half-up
    *     on positives in both), and INJECTIVE on ≤ 2-decimal domains (money,
    *     rates, integral quantities — the profile's registered columns);
    *     a caller profiling free-range doubles estimates the cardinality of
    *     the centi-grid classes instead, which the scaladoc contract states.
    *     NaN / ±Infinity / |x| > 9·10¹⁵ route to the value's string form so
    *     the profiler never throws under Spark 4's ANSI long cast (review
    *     catch) — those classes are counted, but their strings are
    *     cross-engine-canonical only where both engines render them
    *     identically (the registered columns never reach this branch);
    *   - timestamps/dates: the ISO string both engines render identically
    *     (`2000-12-01 00:00:00[.ffffff]`);
    *   - binary: hex (injective; raw bytes are not valid UTF-8 input to md5
    *     string-casting in DuckDB).
    * Null-preserving in every branch, so null tracking stays exact.
    */
  def hashCanonical(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types.{BinaryType, DoubleType, FloatType}
    val ic = col("`" + c.replace("`", "``") + "`")
    df.schema(c).dataType match {
      case DoubleType | FloatType =>
        val d = ic.cast("double")
        when(isnan(d) || abs(d) > lit(9.0e15), d.cast("string"))
          .otherwise(round(d * lit(100)).cast("long").cast("string"))
      case BinaryType => hex(ic)
      case _ => ic.cast("string")
    }
  }

  /** ESTIMATOR twin of [[tableProfile]] — the 100 TB form: per-column row
    * count, null count, and HLL distinct estimate in ONE pass with NO
    * Expand. Each row fans out into #columns narrow (col_name, hash) pairs
    * (a single generate — the unpivot shape), then one keyed aggregation
    * folds a [[graft.functions.ProfileHllCounter]] per column: 2 KiB of
    * state per column regardless of cardinality, map-side combine, shuffle
    * volume = #columns × #partitions sketch rows. That replaces the exact
    * form's scale-killer — the (#columns+1)-way Expand whose shuffle carries
    * every per-partition-distinct value — with fixed state, at the standard
    * 1.04/√256 ≈ 6.5% relative error (`q_table_profile_hll` gates the
    * actual per-column error beside the exact counts as data).
    *
    * Values are hashed through [[hashCanonical]] (see its injectivity
    * contract) and nulls ride the hash stream as a sentinel, so n_nulls is
    * exact and the estimator matches `count(DISTINCT c)`'s null-blindness.
    * Empty table: one all-zero row per column (the literal-names left join —
    * a keyed aggregation emits nothing on nothing).
    */
  def tableProfileHll(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    requireProfilable(cols)
    val agg = new graft.functions.ProfileHllCounter(60)
    // hash in the codegen'd projection BELOW the explode, group by the
    // column INDEX (an Int — no per-row String key allocation through the
    // typed-agg deserializer), restore names by a #columns-row join at the end
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("i"),
        coalesce(TextDedup.tokenHash60(hashCanonical(df, c)),
          lit(graft.functions.ProfileHllCounter.NullSentinel)).as("h"))
    }
    val names = cols.zipWithIndex.toSeq.map { case (c, i) => (i, c) }
      .toDF("i", "col_name")
    df.select(explode(array(entries: _*)).as("kv"))
      .select(col("kv.i").as("i"), col("kv.h").as("h"))
      .as[(Int, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("p"))
      .toDF("i", "p")
      .select(col("i"), col("p._1").as("n_rows"),
        col("p._2").as("n_nulls"), col("p._3").as("est_distinct"))
      .join(names, Seq("i"), "right")
      .select(col("col_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("est_distinct"), lit(0L)).as("est_distinct"))
  }

  /** Requires distinct column names and orderable (non-MAP) column types —
    * see [[requireProfilable]].
    */
  def tableProfile(df: DataFrame): DataFrame = {
    val cols = df.columns
    requireProfilable(cols)
    // "ANY table" includes messy column names: alias identifiers are
    // backtick-quoted (with backticks doubled) and the col_name string
    // literal escapes quotes/backslashes, so `ship date` or `a'b` profile
    // rather than blowing up the stack() parse
    def ident(name: String): String = "`" + name.replace("`", "``") + "`"
    def strLit(name: String): String =
      "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"
    // coalesce: a global sum over ZERO rows is null, and the empty-table
    // profile must read (0 nulls), not (null nulls) — matching the
    // unpivot twin's coalesced left join
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(col(ident(c)).isNull.cast("long")), lit(0L)).as(s"__nn_$c"),
      count_distinct(col(ident(c))).as(s"__nd_$c"))) :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"${strLit(c)}, ${ident(s"__nn_$c")}, ${ident(s"__nd_$c")}")
      .mkString(", ")
    row.select(col("__rows").as("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
  }
}
