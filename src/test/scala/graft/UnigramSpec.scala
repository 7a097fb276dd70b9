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
}
