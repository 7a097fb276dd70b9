package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** MMR diversified selection (Embeddings.mmrSelect) on a hand-checkable
  * geometry: the second-most-relevant candidate is a near-clone of the first,
  * so pure relevance ranks it second but MMR's similarity discount demotes it
  * below a less-relevant-but-novel candidate.
  *
  * Query = x-axis. Candidate 1 (cos≈.958) wins step 1 outright. Candidate 2
  * is candidate 1's in-plane near-clone (pairwise cos≈.9986): step-2 score
  * 0.7·0.941 − 0.3·0.9986 ≈ 0.359. Candidate 3 tilts the SAME amount into z
  * instead (cos≈.950 to the query, only ≈.910 to candidate 1): step-2 score
  * 0.7·0.950 − 0.3·0.910 ≈ 0.392 — the novel direction wins by a ≈0.03
  * margin, orders of magnitude above float32 noise.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def unit(x: Double, y: Double, z: Double): Array[Float] = {
    val n = math.sqrt(x * x + y * y + z * z)
    Array((x / n).toFloat, (y / n).toFloat, (z / n).toFloat)
  }

  private val vecs = Seq(
    (0L, unit(1, 0, 0)),       // the query
    (1L, unit(1, 0.30, 0)),    // most relevant
    (2L, unit(1, 0.36, 0)),    // near-clone of 1 (same plane, sim≈.9986)
    (3L, unit(1, 0, 0.33))     // similar relevance, orthogonal tilt direction
  ).toDF("vec_id", "embedding")

  private val queries = vecs.filter(col("vec_id") === 0L)
  private val cands = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("query_id", "neighbor_id")

  private lazy val picked =
    Embeddings.mmrSelect(vecs, queries, cands, k = 3)
      .orderBy("step").collect().map(r => (r.getLong(1), r.getLong(2)))

  test("step 1 is the pure-relevance argmax") {
    assert(picked.head == ((1L, 1L)))
  }

  test("the near-clone of the first pick is demoted below the novel candidate") {
    assert(picked.map(_._1).toSeq == Seq(1L, 3L, 2L),
      s"expected diversity order 1,3,2 — got ${picked.toSeq}")
  }

  test("selection exhausts a pool smaller than k without repeats") {
    val out = Embeddings.mmrSelect(vecs, queries,
        cands.filter(col("neighbor_id") < 3L), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.length == 2 && out.map(_._1).distinct.length == 2)
  }

  test("duplicate (query, neighbor) pool rows select each id at most once") {
    // a union of two candidate generators without distinct duplicates rows;
    // the oracle's NOT list_contains exclusion drops the copies, so the
    // operator must too (selection state is per id, not per pool row)
    val out = Embeddings.mmrSelect(vecs, queries, cands.union(cands), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.length == 3, s"expected 3 selections, got ${out.toSeq}")
    assert(out.map(_._1).distinct.length == 3)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
  }
}
