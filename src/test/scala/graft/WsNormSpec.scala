package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries
import graft.queries.TextQueries.wsNormalize

/** Whitespace / invisible-character normalization (`q_ws_norm`'s kernel):
  * strips zero-width format characters, collapses whitespace runs (ASCII +
  * NBSP) to one space, trims — and must be idempotent and pass clean
  * single-spaced ASCII through unchanged.
  */
class WsNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(ss: Seq[String]): Seq[String] =
    ss.toDF("s").select(wsNormalize(col("s")).as("n")).as[String].collect().toSeq

  test("strips zero-width characters, collapses runs, trims") {
    val got = norm(Seq(
      "a\u200bb\u200cc\u200dd\ufeffe\u00adf", // every stripped invisible
      "a\u00a0\t b\nc\u000b d",       // NBSP/tab/newline/VT runs
      "  lead and trail  ",
      "already clean ascii"))
    assert(got == Seq(
      "abcdef",
      "a b c d",
      "lead and trail",
      "already clean ascii"))
  }

  test("idempotent on every probe class the q_ws_norm fixture plants") {
    val probes = Seq(
      "doc" + TextQueries.WsProbeZw,
      "doc" + TextQueries.WsProbeRun,
      "doc plain")
    val once = norm(probes)
    val twice = norm(once)
    assert(once == twice)
    // the two infested classes must actually change (the audit counts them)
    assert(once(0) != probes(0) && once(1) != probes(1) && once(2) == probes(2))
  }

  test("single-sourced regex classes stay literal-char-only (RE2/Java seam)") {
    // the oracle interpolates these into RE2; anything beyond a literal
    // character class + quantifier risks divergent dialect semantics
    assert(TextQueries.WsZwClass.matches("""\[[^\\\[\]]+\]"""))
    assert(TextQueries.WsRunClass.matches("""\[[^\\\[\]]+\]\+"""))
  }
}
