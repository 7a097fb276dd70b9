package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Pins the decision-table branches the harness corpus cannot exercise and
  * the shared-intersections refactor's equality guarantee:
  *
  *   - `canon_dup`: the harness corpus has no case/whitespace variants, so
  *     the canonical-hash precedence slot (between `exact_dup` and
  *     `near_dup`) is proven here on a synthetic corpus;
  *   - the decision plan's containment signal (directional filters over the
  *     ONE checkpointed [[TextDedup.shingleIntersections]] frame) must emit
  *     the identical pair set as the standalone [[TextDedup.containmentPairs]]
  *     operator.
  */
class DedupDecisionSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs " +
    "to the river in the morning light with a calm and steady pace"

  test("dedupDecision: canon_dup fires between exact_dup and near_dup") {
    // 1 = canonical base; 2 = case/extra-space variant of 1 (canon_dup);
    // 3 = unrelated keeper; 4 = two-word near-dup of 3 (shingle Jaccard 64%
    // ≥ 60% but mutual containment 78% < 80%, so only the near-dup signal
    // fires for the pair); 5 = 10-word prefix of 3 (contained); 6 =
    // byte-exact copy of 2 (exact_dup beats canon_dup)
    val other = "a tall ship sails to the harbor and the crew is glad to " +
      "see the shore of the island in the warm light of day"
    val variant = "The  Quick Brown fox jumps over the lazy dog and runs " +
      "to the river in the MORNING light with a calm and steady pace"
    val docs = Seq(
      1L -> base,
      2L -> variant,
      3L -> other,
      4L -> other.replace("the harbor and the crew", "the port and that crew"),
      5L -> other.split(" ").take(10).mkString(" "),
      6L -> variant).toDF("doc_id", "text")
    // orthogonal unit vectors: no embedding near-dup pairs interfere
    val emb = (1L to 6L).map { i =>
      (i, Array.tabulate(8)(j => if (j == i.toInt - 1) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")

    val got = graft.queries.CurationQueries.dedupDecisionOf(docs, emb)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "kept", 1L),
      (2L, "canon_dup", 1L),
      (3L, "kept", 3L),
      (4L, "near_dup", 3L),
      (5L, "contained", 3L),
      (6L, "exact_dup", 2L)))
  }

  test("containment via shared shingleIntersections ≡ containmentPairs on sf0.001") {
    val d = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val w = TextDedup.shingleIntersections(d, "doc_id", "text", n = 3)
    val viaShared = w
      .filter(col("inter") * 100 >= lit(80) * col("size_a"))
      .select(col("doc_a").as("contained"), col("doc_b").as("container"))
      .union(w.filter(col("inter") * 100 >= lit(80) * col("size_b"))
        .select(col("doc_b").as("contained"), col("doc_a").as("container")))
    val standalone = TextDedup.containmentPairs(d, "doc_id", "text", n = 3,
      thresholdPct = 80).select("contained", "container")
    assert(standalone.except(viaShared).count() === 0L)
    assert(viaShared.except(standalone).count() === 0L)
    assert(viaShared.count() > 0L, "sf0.001 corpus must contain containment pairs")
  }
}
