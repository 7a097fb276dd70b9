package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Embeddings

/** Hand-computable fixtures for the similarity-search family. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  // Four unit-ish vectors in 4-d: 0 and 1 nearly parallel, 2 orthogonal,
  // 3 anti-parallel to 0.
  private def vecs: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("knnExact ranks by cosine: parallel > orthogonal > anti-parallel") {
    val out = Embeddings.knnExact(vecs, vecs.filter($"vec_id" === 0L), k = 3)
      .orderBy("rank").as[(Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_._3).toSeq === Seq(1, 2, 3))
  }

  test("ivf with all vectors as centroids and full probing equals exact knn") {
    val exact = Embeddings.knnExact(vecs, vecs, k = 2)
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Embeddings.ivfTopK(vecs, vecs, numCentroids = 4, nProbe = 4, k = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf === exact)
  }

  test("ivfRecall is 100% when probing covers all buckets") {
    val rec = Embeddings.ivfRecall(vecs, vecs, numCentroids = 4, nProbe = 4, k = 2)
      .as[(Long, Long, Long)].collect()
    assert(rec.length === 4)
    assert(rec.forall { case (_, hits, k) => hits === k })
  }
}
