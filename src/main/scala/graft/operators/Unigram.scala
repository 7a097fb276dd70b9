package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One Viterbi segmentation of a vocabulary word — TOP-LEVEL case class
  * (Dataset encoder codegen cannot reach nested private classes; the
  * BpeSymWord precedent).
  */
final case class UnigramSegPiece(piece: String, wfreq: Long)

/** Lang-keyed twin of [[UnigramSegPiece]] for the multilingual build. */
final case class UnigramLangSegPiece(lang_id: String, piece: String, wfreq: Long)

/** Per-(language, word) token count under the language's model. */
final case class UnigramLangWordToks(lang_id: String, word: String, n_toks: Long)

/** Unigram-LM (SentencePiece-style) tokenizer skeleton — the OTHER
  * production tokenizer family beside BPE, and a genuinely different shape:
  * where BPE greedily grows a merge list, unigram LM starts from an
  * over-complete CANDIDATE vocabulary and re-estimates piece probabilities
  * by segmenting the corpus under the current model (EM; Kudo 2018,
  * arXiv:1804.10959). This module implements the exact-arithmetic hard-EM
  * (Viterbi) round the `q_unigram_round` gate replays in SQL:
  *
  *   - SEED vocabulary: every ≤[[MaxPieceLen]]-code-point substring of the
  *     corpus vocabulary weighted by word frequency; all single characters
  *     are kept (coverage guarantee — any word segments into characters)
  *     plus the top-`k` longer pieces by the deterministic
  *     (freq DESC, piece ASC) order.
  *   - PIECE COST: `64 − bit_length(freq)` — an integer quantization of
  *     −log₂ p(piece) (up to the constant corpus-total shift, which the
  *     piece-count tie-break absorbs). Floating log-probs are the standard
  *     formulation but are banned from hash oracles (cross-engine `ln`
  *     ulp drift); the bit-length cost keeps the full pipeline in integers
  *     — the same floor-log₂-via-`bin()` idiom as `q_length_hist`.
  *   - E-STEP (hard): per word, the minimum-total-cost segmentation over
  *     seed pieces, ties broken by fewer pieces then lexicographically
  *     smallest space-joined path in UTF-8 byte order. The path tie-break
  *     is optimal-substructure-safe: two distinct partial paths covering
  *     the same prefix of a word first differ at an index inside the
  *     shorter of them (same characters, different separator placement),
  *     so appending a common best suffix never flips the comparison —
  *     which is what lets [[viterbi]] run the linear DP while the DuckDB
  *     oracle ENUMERATES all paths (words ≤ 8 code points, pieces ≤ 4:
  *     bounded tetranacci fan-out) and row_numbers the same ordering.
  *   - M-STEP: piece counts re-estimated from the chosen segmentations,
  *     weighted by word frequency — the round's gated output
  *     (piece, cost, seed_freq, em_freq).
  *
  * Scale shape (the BPE corpus-rollup-once pattern): the corpus is touched
  * exactly once to build the (word, wfreq) vocabulary; seeding is a
  * vocabulary-sized substring fan-out (≤ L·|word| rows per word);
  * segmentation is one `mapPartitions` over the vocabulary with the
  * broadcast piece→cost map (bounded: alphabet + k rows, collected like the
  * BPE merge list); the EM recount shuffles only piece keys. Nothing
  * corpus-sized is ever sorted or joined wholesale.
  */
object Unigram {

  /** Longest candidate piece, in code points. */
  val MaxPieceLen = 4

  /** Cost of a piece with the given corpus frequency: 64 − bit_length(freq),
    * the integer-quantized −log₂ p. Lower = more probable.
    */
  def cost(freq: Long): Long = 64L - (64 - java.lang.Long.numberOfLeadingZeros(freq))

  /** The seeded candidate vocabulary with integer costs:
    * (piece, freq, cost). All single characters + the top-`k` longer
    * substrings by (freq DESC, piece ASC). One vocabulary-sized double
    * explode; `substr` counts code points on both engines.
    */
  def seedPieces(vocab: DataFrame, k: Int): DataFrame = {
    val sub = vocab
      .select(col("word"), col("wfreq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("wfreq"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("i") + 1))).as("j"),
        col("word"), col("i"))
      .select(col("word").substr(col("i"), col("j")).as("piece"), col("wfreq"))
      .groupBy("piece").agg(sum(col("wfreq")).as("freq"))
    val chars = sub.filter(length(col("piece")) === 1)
    val multi = sub.filter(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece").asc).limit(k)
    chars.unionByName(multi)
      .select(col("piece"), col("freq"),
        (lit(64L) - length(bin(col("freq")))).cast("long").as("cost"))
  }

  /** Minimum-cost segmentation of one word under the piece→cost map, ties
    * (cost, n_pieces, path UTF-8) — linear DP over code-point positions.
    * Code-point slicing via [[Bpe.codePoints]] (JVM `substring` tears
    * astral characters); path comparison via [[Bpe.utf8Lt]] (JVM String
    * order disagrees with Spark/DuckDB binary collation on
    * astral-vs-high-BMP). Every word is segmentable: its characters are in
    * the seed by construction.
    */
  def viterbi(word: String, pieceCost: collection.Map[String, Long]): Seq[String] = {
    val cps = Bpe.codePoints(word)
    val n = cps.length
    // per position: (cost, nPieces, reversed piece list); null = unreachable
    final case class St(c: Long, np: Long, rev: List[String]) {
      lazy val pathStr: String = rev.reverse.mkString(" ")
    }
    def better(a: St, b: St): Boolean =
      a.c < b.c || (a.c == b.c && (a.np < b.np ||
        (a.np == b.np && Bpe.utf8Lt(a.pathStr, b.pathStr))))
    val best = new Array[St](n + 1)
    best(0) = St(0L, 0L, Nil)
    var i = 1
    while (i <= n) {
      var b: St = null
      var l = 1
      val lMax = math.min(MaxPieceLen, i)
      while (l <= lMax) {
        val prev = best(i - l)
        if (prev != null) {
          val piece = cps.slice(i - l, i).mkString
          pieceCost.get(piece) match {
            case Some(pc) =>
              val cand = St(prev.c + pc, prev.np + 1, piece :: prev.rev)
              if (b == null || better(cand, b)) b = cand
            case None => ()
          }
        }
        l += 1
      }
      best(i) = b
      i += 1
    }
    require(best(n) != null, s"unsegmentable word '$word' — seed must cover its alphabet")
    best(n).rev.reverse
  }

  /** Sequential reference for the spec: enumerate EVERY segmentation over
    * the seed pieces and pick the (cost, n_pieces, path) minimum — the same
    * search the DuckDB oracle runs as a recursive CTE. Exponential; only
    * for cross-checking [[viterbi]] on short words.
    */
  def bruteForceBest(word: String,
                     pieceCost: collection.Map[String, Long]): Seq[String] = {
    val cps = Bpe.codePoints(word)
    def all(from: Int): Seq[List[String]] =
      if (from == cps.length) Seq(Nil)
      else (1 to math.min(MaxPieceLen, cps.length - from)).flatMap { l =>
        val piece = cps.slice(from, from + l).mkString
        if (pieceCost.contains(piece)) all(from + l).map(piece :: _) else Seq.empty
      }
    all(0).map { p =>
      (p.map(pieceCost).sum, p.length.toLong, p.mkString(" "), p)
    }.reduceLeft { (a, b) =>
      val lt = a._1 < b._1 || (a._1 == b._1 && (a._2 < b._2 ||
        (a._2 == b._2 && Bpe.utf8Lt(a._3, b._3))))
      if (lt) a else b
    }._4
  }

  /** Viterbi-segment every vocabulary word under the broadcast piece→cost
    * map and recount piece usage weighted by word frequency — the E+M body
    * shared by every round. Emits (piece, em_freq) for USED pieces only.
    */
  def segmentCounts(vocab: DataFrame,
                    pieceCost: Map[String, Long]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieceCost)
    val em: Dataset[UnigramSegPiece] = vocab
      .select(col("word"), col("wfreq")).as[(String, Long)]
      .mapPartitions { it =>
        val cm = bc.value
        it.flatMap { case (w, f) => viterbi(w, cm).map(UnigramSegPiece(_, f)) }
      }
    em.toDF().groupBy("piece").agg(sum(col("wfreq")).as("em_freq"))
  }

  /** One EM step over an explicit (piece, freq) candidate table: derive
    * bit-length costs, segment, recount. Emits
    * (piece, cost, in_freq, em_freq) — em_freq = 0 for candidates no best
    * segmentation uses. The piece collect is bounded (alphabet + k rows;
    * the BPE merge-list precedent).
    */
  def emStep(vocab: DataFrame, pieces: DataFrame): DataFrame = {
    val costed = Lineage.cut(pieces.select(col("piece"), col("freq"),
      (lit(64L) - length(bin(col("freq")))).cast("long").as("cost")))
    val pieceCost: Map[String, Long] = costed.select("piece", "cost").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    costed.join(segmentCounts(vocab, pieceCost), Seq("piece"), "left")
      .select(col("piece"), col("cost"), col("freq").as("in_freq"),
        coalesce(col("em_freq"), lit(0L)).as("em_freq"))
  }

  /** ONE hard-EM round over a (word, wfreq) vocabulary: seed, Viterbi-
    * segment every vocabulary word under the broadcast piece costs, recount
    * — emits (piece, cost, seed_freq, em_freq), em_freq = 0 for seeded
    * pieces no best segmentation uses (the pieces the next round's vocab
    * prune would drop — Kudo's iterative shrinking, one step of it gated).
    */
  def emRound(vocab: DataFrame, k: Int): DataFrame =
    emStep(vocab, seedPieces(vocab, k).select("piece", "freq"))
      .withColumnRenamed("in_freq", "seed_freq")

  /** The SECOND hard-EM round — the iteration actually iterating: prune to
    * the pieces round 1 USED (`em_freq > 0`; safe — every word's round-1
    * best segmentation survives the prune, so coverage holds), re-derive
    * costs from the re-estimated counts, re-segment, recount. This is one
    * step of Kudo's iterative vocabulary shrinking with the probability
    * re-estimation in between — emits (piece, cost, prev_freq, em_freq)
    * over the pruned vocabulary.
    */
  def emRound2(vocab: DataFrame, k: Int): DataFrame =
    emStep(vocab,
      emRound(vocab, k).filter(col("em_freq") > 0)
        .select(col("piece"), col("em_freq").as("freq")))
      .withColumnRenamed("in_freq", "prev_freq")

  /** Best ALTERNATIVE segmentation cost of `piece`'s own string under the
    * model with the single-piece path (the piece itself) banned — the
    * first-order surrogate SentencePiece's pruner uses: if the piece were
    * dropped, each of its occurrences would re-segment as this alternative,
    * so the corpus objective rises by em_freq × (altCost − cost). Minimum
    * cost only (no path tie-break needed — cost is the sole output). None
    * when no multi-step path exists, which cannot happen while every single
    * character stays in the model (the [[pruneToTargetNext]] contract).
    */
  def altCost(piece: String,
              pieceCost: collection.Map[String, Long]): Option[Long] = {
    val cps = Bpe.codePoints(piece)
    val n = cps.length
    val NoPath = Long.MaxValue
    val best = Array.fill(n + 1)(NoPath)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(MaxPieceLen, i)
      while (l <= lMax) {
        // the full-span transition IS the piece being priced — ban it
        if (!(i == n && l == n) && best(i - l) != NoPath) {
          pieceCost.get(cps.slice(i - l, i).mkString) match {
            case Some(pc) if best(i - l) + pc < best(i) =>
              best(i) = best(i - l) + pc
            case _ => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == NoPath) None else Some(best(n))
  }

  /** Per-multi-piece PRUNE LOSS under a model: em_freq × (altCost − cost),
    * all integers (costs are bit-length quantized, counts are exact), so
    * the prune ranking is hash-stable across engines. Single-character
    * pieces are never priced — they are the coverage floor the pruner must
    * keep (SentencePiece's required-character contract).
    */
  def pruneLosses(model: Map[String, Long],
                  emFreq: Map[String, Long]): Map[String, Long] =
    model.keysIterator.filter(p => Bpe.codePoints(p).length >= 2).map { p =>
      val alt = altCost(p, model).getOrElse(throw new IllegalStateException(
        s"piece '$p' has no alternative segmentation — a character left the model"))
      p -> emFreq.getOrElse(p, 0L) * (alt - model(p))
    }.toMap

  /** One vocabulary-size-targeted PRUNE step (Kudo's shrinking with a hard
    * size target — the SentencePiece contract BPE's `vocabSize` dispatch
    * has in [[Bpe.train]]): rank the model's multi-character pieces by
    * [[pruneLosses]] (loss DESC — drop the LOWEST-loss pieces — ties by
    * piece ascending in UTF-8 byte order, [[Bpe.utf8Lt]]: the driver-side
    * ranking must agree with the oracle's binary `ORDER BY`), keep the top
    * `keepMulti` plus EVERY single character, and re-estimate each kept
    * piece's frequency from its EM recount. Returns the next model's
    * (piece, freq) rows, ready for [[emStep]] to re-derive costs.
    */
  def pruneToTargetNext(rows: Seq[(String, Long, Long)],
                        keepMulti: Int): Seq[(String, Long)] = {
    val model = rows.map(x => x._1 -> x._2).toMap
    val em = rows.map(x => x._1 -> x._3).toMap
    val kept = pruneLosses(model, em).toSeq
      .sortWith { case ((pa, la), (pb, lb)) =>
        la > lb || (la == lb && Bpe.utf8Lt(pa, pb))
      }
      .take(keepMulti).map(_._1).toSet
    rows.filter(x => Bpe.codePoints(x._1).length == 1 || kept(x._1))
      .map(x => (x._1, x._3))
  }

  /** One-row CORPUS segmentation stats under a piece→cost model — the
    * per-round axis of the EM convergence ladder (`q_unigram_conv`):
    * Σ wfreq (words), Σ wfreq · best-path-cost (the hard-EM objective the
    * stopping rule watches), Σ wfreq · n_pieces (corpus tokens). One
    * vocabulary-sized Viterbi pass over the broadcast map; all integers.
    */
  def corpusStats(vocab: DataFrame, pieceCost: Map[String, Long]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieceCost)
    vocab.select(col("word"), col("wfreq")).as[(String, Long)]
      .mapPartitions { it =>
        val cm = bc.value
        it.map { case (w, f) =>
          val segs = viterbi(w, cm)
          (f, f * segs.map(cm).sum, f * segs.size.toLong)
        }
      }
      .toDF("wf", "wc", "wt")
      .agg(sum(col("wf")).as("n_words"), sum(col("wc")).as("total_cost"),
        sum(col("wt")).as("n_tokens"))
  }

  // ------------------------------------------------------------ multilingual

  /** Per-language seeded candidate vocabularies over a (lang_id, word,
    * wfreq) vocabulary ([[Bpe.langWordVocab]]) — the multilingual build
    * ([[Bpe.pairsByLang]] precedent): each language seeds from its OWN
    * substrings — all of its single characters (per-language coverage) plus
    * its top-`k` longer pieces by the same (freq DESC, piece ASC) order, as
    * a `row_number` window partitioned on the tiny language domain. Emits
    * (lang_id, piece, freq, cost).
    */
  def seedPiecesByLang(langVocab: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_id").orderBy(col("freq").desc, col("piece").asc)
    val sub = langVocab
      .select(col("lang_id"), col("word"), col("wfreq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("lang_id"), col("wfreq"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("i") + 1))).as("j"),
        col("word"), col("i"))
      .select(col("lang_id"),
        col("word").substr(col("i"), col("j")).as("piece"), col("wfreq"))
      .groupBy("lang_id", "piece").agg(sum(col("wfreq")).as("freq"))
    val chars = sub.filter(length(col("piece")) === 1)
    val multi = sub.filter(length(col("piece")) >= 2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    chars.unionByName(multi)
      .select(col("lang_id"), col("piece"), col("freq"),
        (lit(64L) - length(bin(col("freq")))).cast("long").as("cost"))
  }

  /** Collect a per-language piece→cost map from a costed per-language piece
    * frame — bounded (languages × (alphabet + k) rows; the BPE merge-list
    * collect precedent).
    */
  def langCostMaps(costed: DataFrame): Map[String, Map[String, Long]] =
    costed.select(col("lang_id"), col("piece"), col("cost")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(x => x._2 -> x._3).toMap }

  /** Segment each language's vocabulary words under ITS OWN piece→cost map
    * and recount usage — the lang-keyed E+M body. One `mapPartitions` pass
    * with the broadcast per-language maps; emits (lang_id, piece, em_freq)
    * for used pieces.
    */
  def segmentCountsByLang(langVocab: DataFrame,
                          costByLang: Map[String, Map[String, Long]]): DataFrame = {
    val spark = langVocab.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(costByLang)
    langVocab.select(col("lang_id"), col("word"), col("wfreq"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (l, w, f) =>
          viterbi(w, m(l)).map(UnigramLangSegPiece(l, _, f))
        }
      }
      .toDF().groupBy("lang_id", "piece").agg(sum(col("wfreq")).as("em_freq"))
  }

  /** ONE hard-EM round PER LANGUAGE — the multilingual tokenizer build
    * (`q_unigram_bylang`): each language owns its candidate vocabulary,
    * costs, and recount, so a minority language's pieces never compete with
    * the dominant language for seed slots (the exact per-language-BPE
    * argument). Emits (lang_id, piece, cost, seed_freq, em_freq).
    */
  def emRoundByLang(langVocab: DataFrame, k: Int): DataFrame = {
    val costed = Lineage.cut(seedPiecesByLang(langVocab, k))
    costed.join(segmentCountsByLang(langVocab, langCostMaps(costed)),
        Seq("lang_id", "piece"), "left")
      .select(col("lang_id"), col("piece"), col("cost"),
        col("freq").as("seed_freq"),
        coalesce(col("em_freq"), lit(0L)).as("em_freq"))
  }

  /** Per-(language, word) token counts under each language's seed model —
    * the unigram analogue of [[Bpe.encodeVocabByLang]], feeding the
    * by-language fertility twin. Vocabulary-sized; broadcast maps.
    */
  def vocabTokenCountsByLang(langVocab: DataFrame, k: Int): DataFrame = {
    val spark = langVocab.sparkSession
    import spark.implicits._
    val m0 = langCostMaps(Lineage.cut(seedPiecesByLang(langVocab, k)))
    val bc = spark.sparkContext.broadcast(m0)
    langVocab.select(col("lang_id"), col("word"), col("wfreq"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (l, w, _) =>
          UnigramLangWordToks(l, w, viterbi(w, m(l)).size.toLong)
        }
      }
      .toDF()
  }
}
