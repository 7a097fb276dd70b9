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

  private def byPair(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("automaton path equals the join path on the planted corpus") {
    assert(byPair(PhraseTag.tagPhrasesAutomaton(docs, "doc_id", "text", dict)) == out)
  }

  test("automaton path equals the join path on a stopword-led dictionary") {
    // phrases sharing an unselective first token, nested phrases (one a
    // prefix of another — the output-link case), and self-overlap
    val d = Seq(
      (1L, "the a the b the a the a"),
      (2L, "the the the the"),
      (3L, "b the a the b")).toDF("doc_id", "text")
    val dic = Seq("the a", "the b", "the", "the the", "the a the")
    val join = byPair(PhraseTag.tagPhrases(d, "doc_id", "text", dic))
    val ac = byPair(PhraseTag.tagPhrasesAutomaton(d, "doc_id", "text", dic))
    assert(ac == join, s"diverged:\n  ac=$ac\n  join=$join")
    // hand-checked spot values: 'the' 4x in doc 2; 'the the' overlapping
    // starts 1,2,3; 'the a the' at starts 1,5 in doc 1
    assert(join((2L, "the")) == 4L && join((2L, "the the")) == 3L)
    assert(join((1L, "the a the")) == 2L)
  }

  test("automaton path equals the join path on the harness corpus") {
    val d = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val dic = graft.queries.TextQueries.TagPhrases
    val join = byPair(PhraseTag.tagPhrases(d, "doc_id", "text", dic))
    val ac = byPair(PhraseTag.tagPhrasesAutomaton(d, "doc_id", "text", dic))
    assert(join.nonEmpty && ac == join)
  }

  test("automaton rejects degenerate phrases that would diverge from the join form") {
    // empty phrase -> output on the root node = a hit at every token;
    // double space -> split collapses where the join form matches literally
    for (bad <- Seq("", "a  b", "a ", " a")) {
      val e = intercept[IllegalArgumentException] {
        new graft.operators.TokenAhoCorasick(Seq("ok phrase", bad))
      }
      assert(e.getMessage.contains("non-empty"), s"'$bad' not rejected: $e")
    }
  }

  test("automaton path equals the join path on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val tok = Gen.oneOf("a", "b", "c")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val phrase = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, tok).map(_.mkString(" ")))
    val gen = Gen.zip(
      Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, doc)),
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, phrase)).map(_.distinct))
    val prop = Prop.forAll(gen) { case (texts, dic) =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      byPair(PhraseTag.tagPhrases(d, "doc_id", "text", dic)) ==
        byPair(PhraseTag.tagPhrasesAutomaton(d, "doc_id", "text", dic))
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"paths diverged: ${res.status}")
  }
}
