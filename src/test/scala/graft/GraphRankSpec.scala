package graft

import graft.operators.GraphRank

/** Fixed-point PageRank cross-checked against a sequential in-memory
  * implementation of the identical integer recurrence.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: same e6 fixed-point update, same integer division
    * points, plain Scala maps.
    */
  private def seqPageRank(edges: Seq[(Long, Long)], vertices: Seq[Long],
                          iters: Int): Map[Long, Long] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val deg = es.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    var r = vertices.map(_ -> 1000000L).toMap
    (0 until iters).foreach { _ =>
      val s = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = vertices.map(v => v -> (150000L + 850L * s.getOrElse(v, 0L) / 1000L)).toMap
    }
    r
  }

  test("matches the sequential recurrence on an asymmetric graph") {
    // hub 1 ← {2,3,4}; 4 → 5; 5 dangles; 6 isolated
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (4L, 5L), (2L, 1L))
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val got = GraphRank.pageRank(edges.toDF("s", "d"), "s", "d",
        verts.toDF("id"), iters = 5)
      .as[(Long, Long)].collect().toMap
    val want = seqPageRank(edges, verts, 5)
    assert(got === want)
    // the hub outranks everyone; the isolated vertex sits at the teleport floor
    assert(got(1L) > got(5L) && got(5L) > got(6L))
    assert(got(6L) === 150000L)
  }

  test("symmetric pair converges to equal ranks; self-loops are ignored") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L))
    val got = GraphRank.pageRank(edges.toDF("s", "d"), "s", "d",
        Seq(1L, 2L, 3L).toDF("id"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L))
    assert(got(3L) === 150000L) // self-loop dropped → isolated
  }
}
