package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Embeddings
import graft.queries.EmbeddingQueries

/** Graph-ANN SERVING (IVF-seeded beam search over the NN-Descent graph):
  * result validity, the monotone-recall structure of the wave ladder, and
  * stream-static serving parity — pinned on harness data.
  */
class GraphSearchSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def vectors: DataFrame =
    graft.sources.Tables(spark, sfDir, "embeddings")
  private def centroids: DataFrame =
    vectors.filter(col("vec_id") < EmbeddingQueries.NumCentroids)
  private val K = EmbeddingQueries.K

  private def graph: DataFrame = graft.operators.Lineage.cut(
    Embeddings.nnDescentRound(vectors,
      Embeddings.knnGraphSeed(vectors, centroids, EmbeddingQueries.NnSeedAssign, K),
      K))

  test("beam search returns a valid per-query top-k: bounded, ranked, no self") {
    val queries = vectors.filter(col("vec_id") < EmbeddingQueries.NumQueries)
    val res = Embeddings.graphSearch(vectors, queries, graph, centroids,
        EmbeddingQueries.NProbe, EmbeddingQueries.GsBeam, EmbeddingQueries.GsRounds, K)
      .as[(Long, Long, Int)].collect()
    val byQuery = res.groupBy(_._1)
    assert(byQuery.size === EmbeddingQueries.NumQueries)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= K)
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length), s"ranks broken for $q")
      assert(!rows.exists(_._2 == q), s"self-match for $q")
      assert(rows.map(_._2).distinct.length === rows.length, s"dup neighbor for $q")
    }
  }

  /** Structural guarantee worth pinning: hits are computed against the exact
    * top-K by the SAME score, so growing the visited set can only improve
    * the per-wave top-K overlap (a displacing candidate scores higher than
    * the displaced one, hence is itself in the exact top-K whenever the
    * displaced was). The ladder must therefore be non-decreasing, and the
    * expansion waves must actually buy recall over the bare entry probe.
    */
  test("wave recall is non-decreasing and the search beats the bare probe") {
    val queries = vectors.filter(col("vec_id") < EmbeddingQueries.NumQueries)
    val ladder = Embeddings.graphSearchRecall(vectors, queries, graph, centroids,
        EmbeddingQueries.NProbe, EmbeddingQueries.GsBeam, EmbeddingQueries.GsRounds, K)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (seed, r1, r2) = (ladder("seed"), ladder("round1"), ladder("round2"))
    info(s"recall ladder: seed=${seed._2}/${seed._3} (scored ${seed._4}), " +
      s"round1=${r1._2}/${r1._3} (${r1._4}), round2=${r2._2}/${r2._3} (${r2._4})")
    assert(seed._2 <= r1._2 && r1._2 <= r2._2, "wave recall decreased")
    assert(r2._2 > seed._2, "expansion waves added no recall over the probe")
    assert(Seq(seed, r1, r2).forall(_._4 > 0), "a wave scored nothing")
  }

  /** Stream-static serving parity ([[Embeddings.graphProbeSink]]): query
    * micro-batches answered from the ONE pre-built graph + static store must
    * equal the batch search for the same query set, at every chunking —
    * per-batch plans see static frames, so trigger boundaries are invisible.
    */
  test("graphProbeSink: streamed search equals the batch beam search") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = vectors.cache()
    val g = graph
    val queryIds = Seq(3L, 17L, 31L, 45L)
    val queryRows = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val q = Embeddings.graphProbeSink(
      in.toDF().toDF("vec_id", "embedding"), g, corpus, centroids,
      EmbeddingQueries.NProbe, EmbeddingQueries.GsBeam, EmbeddingQueries.GsRounds,
      k = 5, java.nio.file.Files.createTempDirectory("gs-ck").toString) { res =>
      got.synchronized { got ++= res.as[(Long, Long, Int)].collect() }
      ()
    }
    queryRows.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()

    val batch = Embeddings.graphSearch(corpus,
        corpus.filter(col("vec_id").isin(queryIds: _*)), g, centroids,
        EmbeddingQueries.NProbe, EmbeddingQueries.GsBeam, EmbeddingQueries.GsRounds, 5)
      .as[(Long, Long, Int)].collect().toSet
    corpus.unpersist()
    assert(got.synchronized(got.toSet) === batch)
    assert(batch.map(_._1) === queryIds.toSet)
  }
}
