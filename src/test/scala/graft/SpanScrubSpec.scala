package graft

import org.apache.spark.sql.DataFrame
import graft.queries.TextQueries

/** Planted-construction coverage for the round-10 curation additions: the
  * cross-document span scrubber and the Gopher rule battery. The DuckDB
  * oracle proves both end-to-end on the harness corpus; these tests pin the
  * semantics the corpus doesn't isolate — exact coverage boundaries of a
  * planted shared span, the within-doc-repeat exclusion, and each Gopher
  * rule firing alone.
  */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val span = (1 to TextQueries.SpanW).map(i => s"s$i").mkString(" ")

  test("spanScrub deletes exactly the tokens covered by a cross-doc span") {
    val a = s"alpha beta $span gamma delta"
    val b = s"one two three four $span"
    val c = "unique words only here nothing shared with any other document"
    val out = TextQueries.spanScrubOf(docsDf(1L -> a, 2L -> b, 3L -> c))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: the 8 span tokens go, the 4 unique ones stay in order
    assert(out(1L) === ((12L, 8L, "alpha beta gamma delta")))
    assert(out(2L) === ((12L, 8L, "one two three four")))
    // doc 3 shares nothing: untouched
    assert(out(3L) === ((10L, 0L, c)))
  }

  test("spanScrub ignores spans repeated only WITHIN one document") {
    val selfRep = s"$span $span" // the window recurs, but in a single doc
    val other = "totally different tokens that never appear anywhere else at all"
    val out = TextQueries.spanScrubOf(docsDf(1L -> selfRep, 2L -> other))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 0L, "within-doc repetition must not trigger the scrub")
    assert(out(2L) === 0L)
  }

  test("spanScrub: overlapping shared windows merge into one covered range") {
    // 9 shared tokens = two overlapping 8-windows; coverage is the union,
    // not double-deleted, and the doc shorter than W is never window-scanned
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val a = s"head $nine tail"
    val b = nine
    val tiny = "too short" // < SpanW tokens: no windows, no coverage
    val out = TextQueries.spanScrubOf(docsDf(1L -> a, 2L -> b, 3L -> tiny))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((9L, "head tail")))
    assert(out(2L) === ((9L, "")))
    assert(out(3L) === ((0L, "too short")))
  }

  test("gopherRules: each rule fires on its own planted violation") {
    val okBody = (("the of and to in is a " * 8) + "good solid words here " * 6).trim
    val short = "the of tiny" // fails pass_len (< 50 tokens)
    val symbols = (("### !!! *** " * 6) + "the of and to in is a " * 5).trim
    val numeric = (("1234 5678 9999 " * 10) + "the of and to in is a " * 3).trim
    val rows = TextQueries.gopherRulesOf(docsDf(
        1L -> okBody, 2L -> short, 3L -> symbols, 4L -> numeric))
      .collect().map(r => r.getLong(0) -> r.getValuesMap[Long](Seq(
        "pass_len", "pass_symbol", "pass_alpha", "pass_stop", "keep"))).toMap
    assert(rows(2L)("pass_len") === 0L)
    assert(rows(2L)("keep") === 0L)
    assert(rows(3L)("pass_symbol") === 0L, "symbol-word ratio > 10% must fail")
    assert(rows(4L)("pass_alpha") === 0L, "alpha-word fraction < 80% must fail")
    // the planted-violation docs still pass the rules they don't violate
    assert(rows(3L)("pass_stop") === 1L)
    assert(rows(4L)("pass_stop") === 1L)
  }

  test("gopherRules: top-unigram dominance and mean word length bounds") {
    val dominated = (("spam " * 30) + "the of and to in is a " * 5).trim
    val longWords = ("extraordinarily " * 45) + "the of"
    val rows = TextQueries.gopherRulesOf(docsDf(1L -> dominated, 2L -> longWords))
      .collect().map(r => r.getLong(0) -> r.getValuesMap[Long](Seq(
        "pass_top", "pass_wordlen", "n_tokens"))).toMap
    assert(rows(1L)("pass_top") === 0L, "30/65 top-unigram share must fail <=20%")
    assert(rows(2L)("pass_wordlen") === 0L, "mean word length > 10 must fail")
  }
}
