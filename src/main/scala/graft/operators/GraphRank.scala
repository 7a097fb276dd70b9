package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer fixed point — the centrality
  * layer over the same pairwise-evidence graphs the clustering layer
  * ([[ConnectedComponents]]) consumes: rank a document high when many
  * well-connected documents share passages/near-dup evidence with it. In a
  * curation pipeline this surfaces the template/boilerplate HUBS — the pages
  * whose content radiates through the corpus — which is complementary to
  * dedup groups (a hub connects many small groups without being a duplicate
  * of any single one).
  *
  * Arithmetic is e6 fixed point with INTEGER division at every step
  * (`contrib = rank div deg`, `rank' = (1−d)·10⁶ + (d_e3 · Σcontrib) div 10³`)
  * so a DuckDB oracle chains the identical recurrence and every iterate is
  * bit-equal — the float formulation would converge to the same ranking but
  * drift in low-order bits across engines. A FIXED iteration count replaces
  * the usual ε-convergence test: reproducible, oracle-expressible, and in
  * rank-USE terms 5 rounds already separates hubs from leaves (power
  * iteration gains ~one digit of precision per round at d=0.85).
  *
  * Scale: each round is one join of the edge list with the rank frame plus
  * one aggregation on the destination key — O(|E|) shuffled per round with
  * map-side combine on the contribution sum; the rank frame is
  * `localCheckpoint`ed per round to truncate lineage (swap for reliable
  * `checkpoint` on a cluster). Dangling vertices (no out-edges) leak their
  * damped mass rather than redistributing it — the standard simplification
  * when ranks are compared, not summed to 1; documented here for honesty.
  */
object GraphRank {

  val OneE6 = 1000000L

  /** Rank every vertex of `vertices` over the directed `edges` list.
    *
    * @param edges     (src, dst) pairs — directed; pass the symmetric closure
    *                  for an undirected similarity graph
    * @param vertices  vertex universe (first column): isolated vertices rank
    *                  at the teleport floor (1−d)·10⁶
    * @param iters     fixed iteration count
    * @param dampE3    damping factor in e3 fixed point (850 = 0.85)
    * @return (id, rank_e6)
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               vertices: DataFrame, iters: Int = 5, dampE3: Long = 850L): DataFrame = {
    val e = Lineage.cut(edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    val deg = Lineage.cut(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val uni = Lineage.cut(vertices.select(col(vertices.columns.head).cast("long").as("id"))
      .distinct())
    val floor = (OneE6 * (1000L - dampE3)) / 1000L

    var ranks = uni.select(col("id"), lit(OneE6).as("rank_e6"))
    var it = 0
    while (it < iters) {
      val contribs = e.join(ranks.select(col("id").as("src"), col("rank_e6")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_e6 div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = Lineage.cut(
        uni.join(contribs.select(col("dst").as("id"), col("s")), Seq("id"), "left")
          .select(col("id"),
            (lit(floor) + expr(s"($dampE3 * coalesce(s, CAST(0 AS BIGINT))) div 1000")).as("rank_e6")))
      it += 1
    }
    ranks
  }
}
