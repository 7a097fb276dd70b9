package graft

import graft.operators.Bpe

/** BPE tokenizer training ([[graft.operators.Bpe]]) against a sequential
  * reference implementation of the classic algorithm (Sennrich'16): same
  * vocabulary rollup, same (count DESC, pair ASC) tie-break, merges applied
  * greedily left-to-right — the distributed trainer must learn the identical
  * rule sequence.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential reference: BPE merges over a (word -> freq) map. */
  private def referenceTrain(vocab: Map[String, Long], rounds: Int): Seq[(String, String)] = {
    var syms: Map[Seq[String], Long] =
      vocab.map { case (w, f) => Bpe.codePoints(w) -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val best = counts.toSeq
        .sortWith { case ((p1, c1), (p2, c2)) =>
          c1 > c2 || (c1 == c2 && Bpe.pairLt(p1, p2)) }
        .headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          syms = syms.toSeq.map { case (s, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
              else { out += s(i); i += 1 }
            }
            out.toSeq -> f
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => done = true
      }
      r += 1
    }
    merges.toSeq
  }

  /** The classic Sennrich corpus, as documents repeating each word to its
    * frequency.
    */
  private def sennrichDocs = Seq(
    Seq.fill(5)("low").mkString(" "),
    Seq.fill(2)("lower").mkString(" "),
    Seq.fill(6)("newest").mkString(" "),
    Seq.fill(3)("widest").mkString(" ")).toDF("text")

  test("distributed trainer learns the sequential reference's merge sequence") {
    val docs = sennrichDocs
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expected = referenceTrain(vocab, rounds = 8)
    val got = Bpe.train(docs, "text", rounds = 8)
    assert(expected.nonEmpty)
    assert(got == expected, s"merges diverged: got $got, expected $expected")
    // the canonical first merge on this corpus: ('e','s') at weighted count 9
    // (newest 6 + widest 3), tie-broken below ('s','t') by pair order
    assert(got.head == (("e", "s")), s"unexpected first merge: ${got.head}")
  }

  test("learned merges segment words consistently with training") {
    val docs = sennrichDocs
    val merges = Bpe.train(docs, "text", rounds = 6)
    // 'newest' must compress strictly; unseen-but-related 'lowest' shares
    // the learned 'est'-family merges
    val seg = Bpe.segment("newest", merges)
    assert(seg.length < 6, s"no compression: $seg")
    assert(seg.mkString == "newest", "segmentation must round-trip the word")
    assert(Bpe.segment("lowest", merges).mkString == "lowest")
  }

  test("trainer stops when no pair repeats and handles empty input") {
    val docs = Seq("ab cd").toDF("text")
    // every pair occurs once -> freq < 2 -> no merge learned
    assert(Bpe.train(docs, "text", rounds = 3).isEmpty)
    val empty = spark.emptyDataset[String].toDF("text")
    assert(Bpe.train(empty, "text", rounds = 3).isEmpty)
  }

  test("q_bpe_pairs' top pair equals the trainer's first merge") {
    val dir = "/root/testdata/sf0.001"
    val top = graft.queries.TextQueries.bpePairs(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("freq").desc,
        org.apache.spark.sql.functions.col("pair").asc)
      .head()
    val docs = graft.sources.Tables(spark, dir, "documents")
    val firstMerge = Bpe.train(docs, "text", rounds = 1).head
    assert(top.getString(0) == firstMerge._1 + firstMerge._2,
      s"q_bpe_pairs top ${top.getString(0)} != first merge $firstMerge")
  }

  test("localized trainer equals the distributed loop on the Sennrich corpus") {
    val docs = sennrichDocs
    val dist = Bpe.trainDistributed(docs, "text", rounds = 8)
    val local = Bpe.train(docs, "text", rounds = 8) // vocab of 4 -> localizes
    assert(dist.nonEmpty && local == dist,
      s"local/distributed diverged: $local vs $dist")
  }

  test("localized trainer equals the sequential reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(word, Gen.choose(1L, 9L))))
    val prop = Prop.forAll(corpus) { ws =>
      val vocab = ws.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
      val got = Bpe.trainLocal(vocab.toSeq, rounds = 10)
      got == referenceTrain(vocab, rounds = 10)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"trainLocal diverged from reference: ${res.status}")
  }

  test("forced heap compaction cannot change the learned sequence") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // a negative slack makes the lazy-heap rebuild fire on EVERY flush —
    // the branch never triggers at spec scale under the production
    // threshold (4x map size + 64k), so force it and pin equality
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(word, Gen.choose(1L, 9L))))
    val prop = Prop.forAll(corpus) { ws =>
      val vocab = ws.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
      Bpe.trainLocal(vocab.toSeq, rounds = 10, compactSlack = Int.MinValue) ==
        referenceTrain(vocab, rounds = 10)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"compaction changed the sequence: ${res.status}")
  }

  test("train falls back to the distributed loop above the local-vocab cap") {
    val docs = sennrichDocs
    // cap of 2 forces the distributed path on a 4-word vocabulary
    val forced = Bpe.train(docs, "text", rounds = 5, maxLocalVocab = 2)
    assert(forced == Bpe.trainDistributed(docs, "text", rounds = 5))
  }

  test("planBatch accepts a steep symbol-disjoint prefix and stops on each hazard") {
    // steep disjoint counts: all three rules provable from one snapshot
    assert(Bpe.planBatch(Seq((("a", "b"), 100L), (("c", "d"), 10L), (("e", "f"), 3L)),
      sawAll = true, maxMerges = 8) == Seq(("a", "b"), ("c", "d"), ("e", "f")))
    // shared symbol: applying (a,b) can change (b,c)'s count -> stop after 1
    assert(Bpe.planBatch(Seq((("a", "b"), 100L), (("b", "c"), 10L)),
      sawAll = true, maxMerges = 8) == Seq(("a", "b")))
    // self-pair is its own neighbor: gain cap equals its count -> batch of 1
    assert(Bpe.planBatch(Seq((("a", "a"), 100L), (("c", "d"), 99L)),
      sawAll = true, maxMerges = 8) == Seq(("a", "a")))
    // truncated snapshot: uncollected pairs may tie (c,d) at 10 -> stop
    assert(Bpe.planBatch(Seq((("a", "b"), 100L), (("c", "d"), 10L)),
      sawAll = false, maxMerges = 8) == Seq(("a", "b")))
    // neighbor gain: merging (a,b) can create (c,ab) with up to count(c,a)=90
    // occurrences, which would outrank (c,d) at 80 -> stop after 1
    assert(Bpe.planBatch(Seq((("a", "b"), 100L), (("c", "a"), 90L), (("c", "d"), 80L)),
      sawAll = true, maxMerges = 8) == Seq(("a", "b")))
    // maxMerges truncates; count<2 never merges; first rule always accepted
    assert(Bpe.planBatch(Seq((("a", "b"), 100L), (("c", "d"), 10L)),
      sawAll = true, maxMerges = 1) == Seq(("a", "b")))
    assert(Bpe.planBatch(Seq((("a", "b"), 1L)), sawAll = true, maxMerges = 8).isEmpty)
    assert(Bpe.planBatch(Nil, sawAll = true, maxMerges = 8).isEmpty)
  }

  /** Driver-only twin of [[Bpe.trainDistributedBatched]]: identical loop —
    * frozen top-M snapshot, the SAME [[Bpe.planBatch]], the SAME
    * [[Bpe.applyMerges]] — with the distributed pair count computed
    * locally, so scalacheck can hammer the batch planner's hazard logic
    * across hundreds of corpora without a Spark job per sample. The only
    * unshared piece (pair counting + sort) is the piece the Sennrich
    * Spark test pins to the real cluster path.
    */
  private def trainBatchedSim(vocab: Map[String, Long], rounds: Int, topM: Int,
                              withTriples: Boolean): Seq[(String, String)] = {
    var syms: Seq[(Seq[String], Long)] =
      vocab.toSeq.map { case (w, f) => Bpe.codePoints(w) -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val batch =
        if (!withTriples) {
          val rows = counts.toSeq
            .sortWith { case ((p1, c1), (p2, c2)) =>
              c1 > c2 || (c1 == c2 && Bpe.pairLt(p1, p2)) }
            .take(topM + 1)
          Bpe.planBatch(rows, rows.length <= topM, rounds - merges.length)
        } else {
          // mirror Bpe.collectStats: the COMPLETE pair and triple tables
          val t3 = scala.collection.mutable.Map.empty[(String, String, String), Long]
          syms.foreach { case (s, f) =>
            s.indices.dropRight(2).foreach { i =>
              val k = (s(i), s(i + 1), s(i + 2))
              t3(k) = t3.getOrElse(k, 0L) + f
            }
          }
          Bpe.planBatchExact(counts.toMap, t3.toMap, rounds - merges.length)
        }
      if (batch.isEmpty) exhausted = true
      else {
        merges ++= batch
        syms = syms.map { case (s, f) => Bpe.applyMerges(s, batch) -> f }
      }
    }
    merges.toSeq
  }

  test("batched trainer equals the sequential reference on random corpora at every snapshot size") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(word, Gen.choose(1L, 9L))))
    // tiny topM exercises the uncollected-pair ceiling; large topM the
    // full structural/dominance walk
    val topM = Gen.oneOf(2, 4, 16, 64)
    val prop = Prop.forAll(corpus, topM) { (ws, m) =>
      val vocab = ws.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
      val expected = referenceTrain(vocab, rounds = 10)
      // exact (triple-informed) planner AND the pairs-only fallback must
      // both replay the sequential schedule
      trainBatchedSim(vocab, rounds = 10, topM = m, withTriples = true) == expected &&
        trainBatchedSim(vocab, rounds = 10, topM = m, withTriples = false) == expected
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, s"batched trainer diverged from reference: ${res.status}")
  }

  test("batched distributed trainer matches the one-rule loop on the Sennrich corpus") {
    val docs = sennrichDocs
    val baseline = Bpe.trainDistributed(docs, "text", rounds = 8)
    assert(baseline.nonEmpty)
    assert(Bpe.trainDistributedBatched(docs, "text", rounds = 8) == baseline)
    // statsCap = 0 forces the stats-table-too-big degradation, so the
    // pairs-only top-M planBatch branch runs END-TO-END on the cluster
    // path; a 2-pair snapshot still converges (smaller batches, same rules)
    assert(Bpe.trainDistributedBatched(docs, "text", rounds = 8, topM = 2,
      statsCap = 0) == baseline)
    assert(Bpe.trainDistributedBatched(docs, "text", rounds = 8, topM = 64,
      statsCap = 0) == baseline)
    // exhaustion: no repeating pair -> no rules
    assert(Bpe.trainDistributedBatched(Seq("ab cd").toDF("text"), "text", rounds = 3).isEmpty)
  }

  test("argmax tie-breaks in UTF-8 binary order on every path") {
    // U+1F600 (4-byte UTF-8, leads 0xF0) vs U+E000 (3-byte, leads 0xEE):
    // JVM UTF-16 order puts the surrogate-led smile FIRST, UTF-8 binary
    // order (Spark's UTF8String, DuckDB's binary collation) puts it LAST —
    // a tied pair count on such symbols must break the same way everywhere
    val smile = new String(Character.toChars(0x1F600))
    val priv = "\uE000"
    assert(smile < priv && Bpe.utf8Lt(priv, smile)) // the orders disagree
    val vocab = Seq(s"a$smile" -> 2L, s"a$priv" -> 2L)
    assert(Bpe.trainLocal(vocab, rounds = 1) == Seq(("a", priv)))
    assert(Bpe.planBatchExact(
      Map(("a", smile) -> 2L, ("a", priv) -> 2L), Map.empty, 1) == Seq(("a", priv)))
    // the cluster paths (Spark orderBy = UTF-8 binary) agree
    val docs = Seq(s"a$smile a$priv a$smile a$priv").toDF("text")
    assert(Bpe.trainDistributed(docs, "text", rounds = 1) == Seq(("a", priv)))
    assert(Bpe.trainDistributedBatched(docs, "text", rounds = 1) == Seq(("a", priv)))
  }

  test("symbolization is code points everywhere, never UTF-16 code units") {
    val smile = new String(Character.toChars(0x1F600))
    // JVM String.split("") would tear the astral char into two surrogates
    assert(Bpe.codePoints(s"a$smile" + "b") == Seq("a", smile, "b"))
    // deeper training on an astral corpus: local, distributed, and batched
    // loops agree (symbol alphabets identical), and segmentation round-trips
    val docs = Seq(
      Seq.fill(4)(s"$smile${smile}ab").mkString(" "),
      Seq.fill(2)(s"${smile}ab").mkString(" ")).toDF("text")
    val dist = Bpe.trainDistributed(docs, "text", rounds = 4)
    assert(dist.nonEmpty)
    assert(Bpe.train(docs, "text", rounds = 4) == dist) // localizes
    assert(Bpe.trainDistributedBatched(docs, "text", rounds = 4) == dist)
    val seg = Bpe.segment(s"$smile${smile}ab", dist)
    assert(seg.mkString == s"$smile${smile}ab")
    val enc = Bpe.encodeWord(s"$smile${smile}ab", Bpe.rankMap(dist))
    assert(enc.mkString == s"$smile${smile}ab")
  }

  /** The DuckDB oracle's formulation of one encode step: splice the first
    * occurrence of the lowest-rank ' a b '-style pattern in the
    * space-separated symbol string. Used to prove the list-walk encoder and
    * the SQL replay are the SAME algorithm on all inputs, not just the
    * harness corpus.
    */
  private def spliceEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val pats = merges.map { case (a, b) => (s" $a $b ", s" $a$b ") }
    var s = " " + Bpe.codePoints(word).mkString(" ") + " "
    var done = false
    while (!done) {
      pats.find(p => s.contains(p._1)) match {
        case Some((pat, rep)) =>
          val i = s.indexOf(pat)
          s = s.substring(0, i) + rep + s.substring(i + pat.length)
        case None => done = true
      }
    }
    s.trim.split(" ").toSeq.filter(_.nonEmpty)
  }

  test("encodeWord equals the oracle's string-splice formulation on random input") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val word = Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val pair = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c"))
    val merges = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, pair))
      .map(_.distinct)
    val prop = Prop.forAll(word, merges) { (w, ms) =>
      Bpe.encodeWord(w, Bpe.rankMap(ms)) == spliceEncode(w, ms)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"encodeWord diverged from the oracle semantics: ${res.status}")
  }

  test("encodeWord applies rank priority and round-trips the word") {
    // rank 0 = ('a','b') outranks rank 1 = ('b','c'): 'abc' -> [ab, c]
    val rank = Bpe.rankMap(Seq(("a", "b"), ("b", "c")))
    assert(Bpe.encodeWord("abc", rank) == Seq("ab", "c"))
    // reversed ranks: ('b','c') wins -> [a, bc]
    val rank2 = Bpe.rankMap(Seq(("b", "c"), ("a", "b")))
    assert(Bpe.encodeWord("abc", rank2) == Seq("a", "bc"))
    // chained self-pair: leftmost-first single merges -> [aa, aa, a]
    val rank3 = Bpe.rankMap(Seq(("a", "a")))
    assert(Bpe.encodeWord("aaaaa", rank3) == Seq("aa", "aa", "a"))
    // cascading merge: (a,b) then (ab,c) via multi-char rank entry
    val rank4 = Bpe.rankMap(Seq(("a", "b"), ("ab", "c")))
    assert(Bpe.encodeWord("abc", rank4) == Seq("abc"))
    assert(Bpe.encodeWord("", rank4).isEmpty)
  }

  test("encodeVocab round-trips every word and prices compression") {
    val docs = sennrichDocs
    val merges = Bpe.train(docs, "text", rounds = 6)
    val vocab = Bpe.wordVocab(docs, "text")
    val enc = Bpe.encodeVocab(vocab, merges).collect()
    assert(enc.length == 4)
    enc.foreach { e =>
      assert(e.toks.mkString == e.word, s"lost characters: $e")
      assert(e.toks.length <= e.word.length)
    }
    // trained merges must compress the words they were trained on
    assert(enc.map(e => e.toks.length.toLong * e.wfreq).sum <
      enc.map(e => e.word.length.toLong * e.wfreq).sum)
  }

  test("q_bpe_train's merge table is well-formed at its gated depth") {
    // The registered q_bpe_train runs BpeTrainRounds (16) rounds on the
    // harness corpus specifically so multi-character symbols appear on
    // both sides of later rules — the regime round-1 pair statistics
    // (q_bpe_pairs) cannot reach. Assert that structure holds: contiguous
    // ranks, every multi-char symbol produced by an EARLIER rule, and at
    // least one rule whose left side is itself a merged symbol.
    val rows = graft.queries.TextQueries.bpeTrain(spark, "/root/testdata/sf0.001")
      .orderBy("merge_rank").collect()
    assert(rows.nonEmpty && rows.length <= graft.queries.TextQueries.BpeTrainRounds)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      "merge ranks must be contiguous from 1")
    val produced = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      Seq(r.getString(1), r.getString(2)).foreach { sym =>
        assert(sym.length == 1 || produced.contains(sym),
          s"symbol '$sym' at rank ${r.getLong(0)} was never produced by an earlier rule")
      }
      produced += r.getString(1) + r.getString(2)
    }
    assert(rows.exists(_.getString(1).length > 1),
      "16 rounds must reach a rule whose LEFT side is a merged symbol")
  }

  test("bpeTokenCounts joins vocabulary token counts back to documents") {
    val docs = Seq((1L, "low low lower"), (2L, "newest widest"), (3L, "low"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 4)
    val rank = Bpe.rankMap(merges)
    val got = Bpe.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def n(w: String) = Bpe.encodeWord(w, rank).length.toLong
    assert(got == Map(
      1L -> (2 * n("low") + n("lower")),
      2L -> (n("newest") + n("widest")),
      3L -> n("low")))
  }
}
