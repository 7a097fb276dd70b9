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
      vocab.map { case (w, f) => w.split("").toSeq.filter(_.nonEmpty) -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
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
}
