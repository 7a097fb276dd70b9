package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One vocabulary word as a symbol sequence under the merges learned so far.
  * Top-level (not nested in [[Bpe]]) so Spark's generated encoder projections
  * can reach the constructor.
  */
case class BpeSymWord(syms: Seq[String], wfreq: Long)

/** Byte-pair-encoding tokenizer TRAINING at corpus scale — the merge-rule
  * learning loop (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units", ACL'16) expressed as Spark aggregations.
  *
  * The classic trainer is a single-machine loop over a word-frequency table;
  * the corpus-scale realization splits it into
  *
  *   1. ONE corpus pass that rolls the token stream up to the (word, freq)
  *      vocabulary — the only stage that touches corpus-sized data, a plain
  *      hash aggregation with map-side combine, after which everything is
  *      vocabulary-sized (≤ a few million rows at 100 TB, vs billions of
  *      documents);
  *   2. per merge round, an adjacent-pair count over the symbolized vocabulary
  *      (explode + weighted sum — the pair domain is at most Σ|word| over the
  *      vocab), an argmax collect of exactly ONE row to the driver (the merge
  *      rule — bounded by construction, not a `.collect()` anti-pattern), and
  *      a narrow typed map that applies the merge to each word's symbol array
  *      (no shuffle; the vocabulary stays partitioned as-is).
  *
  * Ties break deterministically by (count DESC, pair ASC) so training is
  * reproducible run-to-run and across partitionings. The round loop
  * checkpoints the symbol table every few rounds via [[Lineage.cut]] —
  * without it, round r's plan contains r nested typed maps and driver
  * planning time grows quadratically.
  *
  * [[pairCounts]] (the round-1 count over raw characters) is registered as
  * `q_bpe_pairs` with a DuckDB oracle; the full trainer is spec-proven
  * against a sequential reference implementation (`BpeSpec`).
  */
object Bpe {

  /** Corpus pass: whitespace token stream → (word, freq) vocabulary.
    * The ONLY corpus-sized stage of BPE training.
    */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wfreq"))

  /** Adjacent CHARACTER-pair counts over the vocabulary, weighted by word
    * frequency — BPE round 1, where every symbol is still a single character,
    * so a pair is exactly a 2-char substring. Vocabulary-sized input, pair
    * fan-out bounded by Σ(|word|-1), one aggregation with map-side combine.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(length(col("word")) >= 2)
      .select(col("word"), col("wfreq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("wfreq"), col("word").substr(col("i"), lit(2)).as("pair"))
      .groupBy("pair").agg(sum(col("wfreq")).as("freq"))

  /** Top-`k` merge candidates by weighted pair frequency, deterministically
    * tie-broken — plans as TakeOrdered (per-partition heaps, no global sort).
    */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(wordVocab(docs, textCol))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(k)

  /** Train `rounds` BPE merge rules over the corpus. Returns the learned
    * merges in order. Stops early when no pair occurs twice (nothing left to
    * compress). The symbol table lives distributed for the whole loop; only
    * the single argmax row crosses to the driver each round.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // split-on-empty keeps a trailing "" under Spark's limit=-1 semantics —
    // array_remove drops it so symbols are exactly the characters
    var vocab: Dataset[BpeSymWord] = wordVocab(docs, textCol)
      .select(array_remove(split(col("word"), ""), "").as("syms"), col("wfreq"))
      .as[BpeSymWord]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      // pair counts over the CURRENT symbolization: (left, right) adjacent
      // symbol pairs weighted by word frequency — vocabulary-sized work
      val best = vocab.flatMap { w =>
          w.syms.iterator.zip(w.syms.iterator.drop(1))
            .map { case (a, b) => (a, b, w.wfreq) }.toSeq
        }
        .toDF("left", "right", "wfreq")
        .groupBy("left", "right").agg(sum(col("wfreq")).as("freq"))
        .orderBy(col("freq").desc, col("left").asc, col("right").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect() // exactly one row — the learned rule
      best.headOption match {
        case Some((a, b, freq)) if freq >= 2 =>
          merges += ((a, b))
          val merged = a + b
          vocab = vocab.map { w =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < w.syms.length) {
              if (i + 1 < w.syms.length && w.syms(i) == a && w.syms(i + 1) == b) {
                out += merged; i += 2
              } else { out += w.syms(i); i += 1 }
            }
            BpeSymWord(out.toSeq, w.wfreq)
          }
          // truncate the growing typed-map lineage every few rounds
          if ((merges.length % 4) == 0)
            vocab = Lineage.cut(vocab.toDF()).as[BpeSymWord]
        case _ => exhausted = true
      }
      round += 1
    }
    merges.toSeq
  }

  /** Segment `word` with the learned merges (applied in training order) —
    * the inference half, driver-side over one word; used by specs to show
    * the rules round-trip.
    */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.split("").toSeq.filter(_.nonEmpty)
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }
}
