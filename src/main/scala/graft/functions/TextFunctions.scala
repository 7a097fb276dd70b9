package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for document pipelines: tokenization counts,
  * language identification (stopword-marker heuristic), and quality scoring.
  *
  * All outputs are integers or strings (ratios are expressed as ×10⁴
  * floor-divided integers), so every function is bit-exactly reproducible in
  * the DuckDB oracle — no float drift. Patterns stay within the regex subset
  * where Java regex and RE2 agree (literal classes, alternation, `\b`).
  */
object TextFunctions {

  /** Whitespace token count (single-space tokenizer, matching string_split). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: letter runs, digit runs, and single other symbols. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column = regexp_count(text, lit("[.,!?;:]"))

  private val markers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "fr" -> "\\b(le|les|et|est|dans|une)\\b",
    "es" -> "\\b(el|los|las|y|es|en una)\\b")

  /** Per-language stopword-marker hit count. */
  def markerCount(text: Column, lang: String): Column =
    regexp_count(text, lit(markers.toMap.apply(lang)))

  /** n-gram-heuristic language ID: argmax of marker counts with a fixed
    * priority order (en > de > fr > es), 'und' (undetermined) when no marker
    * fires.
    */
  def langId(text: Column): Column = {
    val Seq(en, de, fr, es) = markers.map { case (l, _) => markerCount(text, l) }
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Integer floor division; counts here are ≤1e8 so the double intermediate
    * is exact and matches DuckDB's `//` (see AnalyticQueries oracle rules).
    */
  private def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** English-stopword ratio ×10⁴, floor-divided (exact integer). */
  def stopwordRatioE4(text: Column): Column =
    idiv(markerCount(text, "en").cast("long") * 10000L,
      greatest(tokenCount(text).cast("long"), lit(1L)))

  /** Heuristic quality score in [0, 10000]: rewards stopword density and
    * doc length, penalizes punctuation density. Pure integer arithmetic.
    */
  def qualityScoreE4(text: Column): Column = {
    val toks = greatest(tokenCount(text).cast("long"), lit(1L))
    val stop = markerCount(text, "en").cast("long")
    val punct = punctCount(text).cast("long")
    val lenScore = least(tokenCount(text).cast("long"), lit(100L)) * 30L
    val stopScore = least(idiv(stop * 40000L, toks), lit(4000L))
    val punctPenalty = least(idiv(punct * 20000L, toks), lit(2000L))
    greatest(least(lenScore + stopScore - punctPenalty, lit(10000L)), lit(0L))
  }
}
