package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextDedup
import graft.queries.CurationQueries
import graft.streaming.ManifestStream

/** The streaming corpus manifest must equal the batch capstone on the same
  * feed: every verdict branch exercised, related docs crossing micro-batch
  * boundaries (a cross-batch exact dup, a cross-batch near-dup, an
  * intra-batch near-dup chain), and a late out-of-order event — emitted
  * incrementally, one verdict per doc, equal to
  * [[CurationQueries.corpusManifestOf]] over the full corpus.
  */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the cat is of the house and to the garden in a way that is the best of all things"
  private val evalText =
    "benchmark question alpha beta gamma delta epsilon zeta eta theta"
  private val bird =
    "the bird is to the nest and of the tall tree in a calm place where " +
      "the first of many small things landed "

  // the CorpusManifestSpec fixture plus an intra-batch exact dup (43) and a
  // near-dup chain third member (25)
  private val docs: Seq[(Long, String)] = Seq(
    0L -> evalText,                       // eval_holdout; supplies eval 8-grams
    1L -> "der hund ist nicht das haus und die katze ist nicht der garten", // dropped_lang
    2L -> "the ;;; !!!",                  // dropped_quality
    3L -> (good + " version one"),        // kept (exact-dup winner)
    23L -> (good + " version one"),       // dropped_exact_dup (cross-batch)
    43L -> (good + " version one"),       // dropped_exact_dup (intra-batch with 23)
    4L -> (bird + "here"),                // kept (near-dup winner)
    24L -> (bird + "there"),              // dropped_near_dup (cross-batch vs 4)
    25L -> (bird + "near"),               // dropped_near_dup (intra-batch with 24, chain)
    5L -> ("the tale mentions question alpha beta gamma delta epsilon zeta eta " +
      "while the fox is of the den and to the deep wood of late evening"), // dropped_contaminated
    6L -> ("the dog is of the yard and to the fence in a form that is the kind of " +
      "every other thing")                // kept
  )

  test("streamed verdicts across 4 micro-batches equal the batch manifest") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val full = docs.toDF("doc_id", "text")
    // the static benchmark slice: eval shingles from the corpus's eval docs,
    // known up front (fixed benchmark artifacts — the CorpusCleanStream contract)
    val evalShingles = TextDedup.shingles(
      full.filter($"doc_id" % 20 === 0), "doc_id", "text", 8)
      .select("shingle").distinct()

    val in = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Option[String])]
    val q = ManifestStream.run(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      evalShingles, qualityFloor = graft.queries.TextQueries.QualityFloor,
      checkpointDir = Files.createTempDirectory("manifest-ck").toString) { verdicts =>
      val rows = verdicts.as[(Long, String, Option[String])].collect()
      out.synchronized { out ++= rows }
      ()
    }

    def byId(ids: Long*): Seq[(Long, String)] =
      ids.map(i => i -> docs.toMap.apply(i))
    // b1: eval doc, a lang drop, the exact-dup winner
    // b2: quality drop, the near-dup winner, doc 23 (cross-batch dup of 3)
    // b3: 43 arrives LATE (out of id order vs b2's 23 — unrelated ordering is
    //     free; related order 23 < 43 held), the cross-batch near-dup 24 and
    //     its intra-batch chain member 25, the contaminated doc
    // b4: the last kept doc
    Seq(byId(0L, 1L, 3L), byId(2L, 4L, 23L), byId(43L, 24L, 25L, 5L), byId(6L))
      .foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()

    val got = out.synchronized(out.toList)
    assert(got.size === docs.size, s"expected one verdict per doc, got ${got.size}")
    assert(got.map(_._1).distinct.size === docs.size, "a doc was emitted twice")

    val batch = CurationQueries.corpusManifestOf(full)
      .as[(Long, String, Option[String])].collect().toSet
    assert(got.toSet === batch)

    // spot-check the cross-batch branches really fired
    val v = got.map(r => r._1 -> r._2).toMap
    assert(v(23L) === "dropped_exact_dup" && v(43L) === "dropped_exact_dup")
    assert(v(24L) === "dropped_near_dup" && v(25L) === "dropped_near_dup")
    assert(v(5L) === "dropped_contaminated")
    assert(Seq(3L, 4L, 6L).forall(v(_) === "kept"))
  }
}
