package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], verts: Option[Seq[Long]] = None): Map[Long, Long] =
    ConnectedComponents.run(
      edges.toDF("a", "b"), "a", "b",
      verts.map(_.toDF("doc_id")))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its min id") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; cycles are fine") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (12L, 10L), (7L, 8L)))
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 7L -> 7L, 8L -> 7L))
  }

  test("edge direction, duplicates and self-loops are ignored") {
    val got = cc(Seq((5L, 2L), (2L, 5L), (5L, 2L), (3L, 3L), (2L, 9L)))
    assert(got === Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 3L -> 3L))
  }

  test("isolated vertices from the universe become singletons") {
    val got = cc(Seq((1L, 2L)), verts = Some(Seq(1L, 2L, 3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("a long path converges within the iteration bound (pointer jumping)") {
    val n = 64L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.size === n)
    assert(got.values.forall(_ == 1L))
  }

  test("star graph converges in one round regardless of size") {
    val edges = (2L to 40L).map(i => (1L, i))
    val got = cc(edges)
    assert(got.values.forall(_ == 1L))
  }

  test("an insufficient iteration bound fails loudly, not silently wrong") {
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, "a", "b", maxIter = 1)
    }
  }

  /** Sequential union-find with path compression — the single-node reference
    * implementation the distributed labels must equal.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labeling: roots chosen as min of each union make find() the label
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("property: labels equal sequential union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(gen) { edges =>
        edges.isEmpty || cc(edges) == unionFind(edges)
      })
    assert(r.passed, r.status.toString)
  }
}
