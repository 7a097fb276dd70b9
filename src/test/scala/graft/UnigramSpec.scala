package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Bpe, Unigram}

/** The unigram-LM hard-EM round's moving parts, pinned against sequential
  * references (the gate proves Spark ≡ DuckDB; these prove the ALGORITHM —
  * a DP bug mirrored into the oracle's enumeration would pass the gate):
  *
  *   - [[Unigram.viterbi]] (linear DP with the (cost, n_pieces, path)
  *     tie-break) must equal [[Unigram.bruteForceBest]] (exhaustive
  *     enumeration) on every corpus word AND on adversarial synthetic piece
  *     tables engineered to tie on cost — the optimal-substructure claim
  *     for the lexicographic tie-break, executed;
  *   - segmentation coverage: every corpus word re-concatenates from its
  *     pieces;
  *   - the EM recount conserves mass: Σ em_freq over pieces equals
  *     Σ wfreq · n_pieces(word) of the chosen segmentations.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sfDir = "/root/testdata/sf0.001"
  private lazy val vocab = Bpe.wordVocab(
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("text")), "text")
    .cache()
  private lazy val pieceCost: Map[String, Long] =
    Unigram.seedPieces(vocab, 12).select("piece", "cost").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("viterbi equals the exhaustive reference on every corpus word") {
    val words = vocab.select("word").collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val dp = Unigram.viterbi(w, pieceCost)
      val ref = Unigram.bruteForceBest(w, pieceCost)
      assert(dp === ref, s"word '$w': dp=$dp ref=$ref")
      assert(dp.mkString("") === w, s"pieces of '$w' must re-concatenate")
    }
  }

  test("viterbi tie-break survives engineered cost ties (DP vs enumeration)") {
    // alphabet pieces all cost 5; multi-char pieces chosen so several
    // segmentations tie on total cost AND piece count, forcing the path
    // tie-break to decide — e.g. 'abab': (ab ab) vs (a bab) vs (aba b) all
    // 2 pieces; costs tuned so several pairs tie exactly
    val cost = Map(
      "a" -> 5L, "b" -> 5L, "c" -> 5L,
      "ab" -> 7L, "ba" -> 7L, "bab" -> 9L, "aba" -> 9L,
      "abab" -> 14L, "abc" -> 12L, "bc" -> 7L)
    val words = Seq("abab", "ababab", "abcabc", "aaaa", "bcbcbc", "abba",
      "cabab", "abcba")
    words.foreach { w =>
      val dp = Unigram.viterbi(w, cost)
      val ref = Unigram.bruteForceBest(w, cost)
      assert(dp === ref, s"word '$w': dp=$dp ref=$ref")
    }
  }

  test("round 2 prunes to exactly round 1's used pieces and re-segments under them") {
    val r1 = Unigram.emRound(vocab, 12).cache()
    val used = r1.filter(col("em_freq") > 0).select("piece").collect()
      .map(_.getString(0)).toSet
    val r2 = Unigram.emRound2(vocab, 12).cache()
    val r2Pieces = r2.select("piece").collect().map(_.getString(0)).toSet
    assert(r2Pieces === used, "round 2's candidate set must be round 1's used set")
    // coverage survives the prune: every round-2 segmentation mass equals a
    // full re-segmentation of the corpus vocabulary
    val mass = r2.agg(org.apache.spark.sql.functions.sum("em_freq")).head.getLong(0)
    val cost2 = r2.select("piece", "cost").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = vocab.as[(String, Long)].collect().map { case (w, f) =>
      Unigram.viterbi(w, cost2).size.toLong * f
    }.sum
    assert(mass === expected)
    r1.unpersist(); r2.unpersist()
    ()
  }

  /** The multilingual build must be EXACTLY per-language independence: for
    * every language, the lang-keyed round equals a standalone [[Unigram.emRound]]
    * run over that language's own vocabulary slice — no cross-language
    * leakage through the shared seed window or the broadcast maps.
    */
  test("by-language round equals an independent per-language round") {
    val langVocab = Bpe.langWordVocab(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("text")),
      "text", graft.functions.TextFunctions.langId(col("text"))).cache()
    val byLang = Unigram.emRoundByLang(langVocab, 12)
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(x => (x._2, x._3, x._4, x._5)).toSet }
    assert(byLang.size >= 2, s"harness corpus should label >= 2 languages: ${byLang.keySet}")
    byLang.keys.foreach { l =>
      val solo = Unigram.emRound(
          langVocab.filter(col("lang_id") === l).select("word", "wfreq"), 12)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(byLang(l) === solo, s"lang $l diverged from its standalone round")
    }
    langVocab.unpersist()
    ()
  }

  /** Convergence-ladder invariants: each round's model is exactly the
    * previous round's used pieces (Kudo's shrinking), so the model-size
    * column is non-increasing, and every round segments the full corpus
    * (constant n_words).
    */
  test("EM convergence ladder: models shrink to used pieces, corpus stays covered") {
    var pieces = Unigram.seedPieces(vocab, 12).select("piece", "freq")
    val stats = (1 to 3).map { _ =>
      val out = Unigram.emStep(vocab, pieces).cache()
      val nModel = out.count()
      val nUsed = out.filter(col("em_freq") > 0).count()
      pieces = out.filter(col("em_freq") > 0)
        .select(col("piece"), col("em_freq").as("freq"))
      (nModel, nUsed)
    }
    stats.sliding(2).foreach { case Seq((_, used), (nextModel, _)) =>
      assert(nextModel === used, "round r+1 model must be round r's used set")
    }
    assert(stats.map(_._1) === stats.map(_._1).sorted.reverse, "model sizes must not grow")
  }

  test("EM recount conserves segmentation mass") {
    val out = Unigram.emRound(vocab, 12).cache()
    val emTotal = out.agg(org.apache.spark.sql.functions.sum("em_freq"))
      .head.getLong(0)
    val expected = vocab.as[(String, Long)].collect().map { case (w, f) =>
      Unigram.viterbi(w, pieceCost).size.toLong * f
    }.sum
    assert(emTotal === expected)
    // the seed is over-complete by design: some candidates go unused and
    // would be pruned by the next round (Kudo's iterative shrinking)
    assert(out.filter(col("em_freq") === 0).count() > 0)
    assert(out.filter(col("em_freq") > 0).count() > 0)
    out.unpersist()
    ()
  }

  test("altCost equals exhaustive non-self enumeration on every multi piece") {
    val multi = pieceCost.keys.filter(Bpe.codePoints(_).length >= 2)
    assert(multi.nonEmpty)
    multi.foreach { p =>
      val cps = Bpe.codePoints(p)
      // exhaustive: every segmentation of p over the model, self excluded
      def all(from: Int): Seq[List[String]] =
        if (from == cps.length) Seq(Nil)
        else (1 to math.min(Unigram.MaxPieceLen, cps.length - from)).flatMap { l =>
          val pc = cps.slice(from, from + l).mkString
          if (pieceCost.contains(pc)) all(from + l).map(pc :: _) else Seq.empty
        }
      val ref = all(0).filter(_.length >= 2).map(_.map(pieceCost).sum)
      val got = Unigram.altCost(p, pieceCost)
      assert(got === ref.minOption, s"altCost mismatch for '$p'")
      // the first-order loss surrogate is nonnegative: dropping a piece can
      // never make its own occurrences CHEAPER to segment
      got.foreach(a => assert(a >= pieceCost(p), s"alt path beat '$p' itself"))
    }
  }

  test("prune-to-target keeps every character, hits the size exactly, and drops the lowest losses") {
    val out = Unigram.emRound(vocab, 12)
      .select(col("piece"), col("cost"), col("em_freq")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val model = out.map(x => x._1 -> x._2).toMap
    val em = out.map(x => x._1 -> x._3).toMap
    val chars = out.map(_._1).filter(Bpe.codePoints(_).length == 1).toSet
    val next = Unigram.pruneToTargetNext(out, 7)
    val nextSet = next.map(_._1).toSet
    assert(chars.subsetOf(nextSet), "a single character was pruned")
    assert(nextSet.count(Bpe.codePoints(_).length >= 2) === 7)
    // every kept multi piece's loss >= every dropped piece's loss
    val losses = Unigram.pruneLosses(model, em)
    val (keptL, dropL) = losses.partition { case (p, _) => nextSet(p) }
    if (keptL.nonEmpty && dropL.nonEmpty)
      assert(keptL.values.min >= dropL.values.max)
    // re-estimated frequencies ride along
    next.foreach { case (p, f) => assert(f === em(p)) }
  }
}
