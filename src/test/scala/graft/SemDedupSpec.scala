package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** SemDeDup (Embeddings.semDedup) decision semantics on a hand-checkable
  * corpus: cluster-restricted blocking (no cross-cell duplicate resolution,
  * by design), the farthest-from-centroid keep-rule, singleton identity, and
  * verdict/canonical consistency.
  *
  * Geometry: centroids are vec 0 ≈ x-axis and vec 1 ≈ y-axis. Vectors 2, 3,
  * 4 sit near the x-axis (cell 0) with pairwise cosine above the threshold —
  * one duplicate group whose keeper must be the member with the LOWEST
  * cosine to centroid 0 (vec 4, tilted furthest). Vector 5 sits near the
  * y-axis (cell 1) alone; vector 6 is ALSO x-like but lands in cell 0 at a
  * cosine below the pair threshold to the others — a singleton inside a
  * populated cell.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def unit(x: Double, y: Double, z: Double): Array[Float] = {
    val n = math.sqrt(x * x + y * y + z * z)
    Array((x / n).toFloat, (y / n).toFloat, (z / n).toFloat)
  }

  private val vecs = Seq(
    (0L, unit(1, 0, 0)),        // centroid of cell 0
    (1L, unit(0, 1, 0)),        // centroid of cell 1
    (2L, unit(1, 0.05, 0)),     // cell 0, cos≈0.999 to centroid
    (3L, unit(1, 0.10, 0)),     // cell 0, slightly farther
    (4L, unit(1, 0.30, 0)),     // cell 0, farthest of the trio → keeper
    (5L, unit(0.45, 1, 0)),     // cell 1 (cos≈0.912 to centroid 1 — below the
                                // pair threshold, so a true singleton)
    (6L, unit(0.5, 0.1, 0.85))  // cell 0 but below pair threshold vs 2/3/4
  ).toDF("vec_id", "embedding")

  private lazy val out = Embeddings.semDedup(
      vecs, vecs.filter(col("vec_id") < 2), threshold = 0.93)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
    .toMap

  test("every vector gets exactly one verdict row") {
    assert(out.keySet == (0L to 6L).toSet)
  }

  test("within-cell duplicates group together and keep the farthest-from-centroid member") {
    // 0,2,3,4 all near x: cos(0,2)=~0.999 ≥ .93 — centroid vec 0 itself joins
    // the group; keeper = lowest centroid cosine = vec 4.
    Seq(0L, 2L, 3L, 4L).foreach { id =>
      assert(out(id)._2 == 4L, s"vec $id canonical ${out(id)._2}, expected 4")
    }
    assert(out(4L)._3 == "kept")
    Seq(0L, 2L, 3L).foreach(id => assert(out(id)._3 == "dropped"))
  }

  test("a below-threshold member of a populated cell stays a kept singleton") {
    assert(out(6L)._1 == 0L, "vec 6 should assign to cell 0")
    assert(out(6L)._2 == 6L && out(6L)._3 == "kept")
  }

  test("singleton cells keep their member") {
    assert(out(5L)._1 == 1L && out(5L)._2 == 5L && out(5L)._3 == "kept")
    assert(out(1L)._2 == 1L && out(1L)._3 == "kept")
  }

  test("blocking is cluster-restricted: no cross-cell grouping even at high cosine") {
    // vec 5 (cell 1) vs centroid 1: same direction family as nothing in cell 0;
    // but the structural claim is stronger — every group's members share one cell.
    val cells = Embeddings.semDedup(vecs, vecs.filter(col("vec_id") < 2), 0.93)
      .select(col("canonical_id"), col("cent_id")).distinct()
      .groupBy("canonical_id").count().collect()
    cells.foreach(r => assert(r.getLong(1) == 1L,
      s"group ${r.getLong(0)} spans ${r.getLong(1)} cells"))
  }
}
