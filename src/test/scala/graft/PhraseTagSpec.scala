package graft

import graft.operators.PhraseTag

/** Dictionary phrase tagging (PhraseTag.tagPhrases) semantics on a
  * hand-checkable corpus: per-start-position counting (overlapping
  * occurrences each count), end-of-document truncation never false-matches,
  * multi-phrase documents tag once per phrase, and unmatched (doc, phrase)
  * pairs are absent rather than zero.
  */
class PhraseTagSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a b"),          // "a a" occurs at starts 1 and 2 → 2 hits
    (2L, "x hash join y hash join"),
    (3L, "ends with hash"),   // "hash join" truncated at the end — no match
    (4L, "hash join b c b")   // two phrases in one doc
  ).toDF("doc_id", "text")

  private val dict = Seq("a a", "hash join", "b c b")

  private lazy val out = PhraseTag.tagPhrases(docs, "doc_id", "text", dict)
    .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("overlapping occurrences count per start position") {
    assert(out((1L, "a a")) == 2L)
  }

  test("repeated phrases count all occurrences") {
    assert(out((2L, "hash join")) == 2L)
  }

  test("a phrase truncated by the document end does not match") {
    assert(!out.contains((3L, "hash join")))
  }

  test("multiple distinct phrases tag the same document independently") {
    assert(out((4L, "hash join")) == 1L && out((4L, "b c b")) == 1L)
  }

  test("no zero-hit rows appear") {
    assert(out.values.forall(_ >= 1L))
    assert(out.size == 4)
  }
}
