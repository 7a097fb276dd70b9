package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering layer
  * that turns pairwise near-dup evidence (LSH / SimHash / embedding pairs)
  * into dedup GROUPS: every vertex is labeled with the minimum vertex id
  * reachable from it, so a group is "all docs transitively near-dup to each
  * other" and the label doubles as a stable group id.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round does
  *
  *   1. propagate:  comp(v) ← min(comp(v), min over neighbors u of comp(u))
  *   2. jump:       comp(v) ← comp(comp(v))   (path compression)
  *
  * Both steps are plain shuffled joins/aggregations on vertex-id keys, so the
  * work per round is O(|E|) with map-side combine on the neighbor-min. The
  * jump step halves the label-chain depth each round, giving O(log d)
  * convergence in the component diameter d — dedup components in practice are
  * tiny clusters (pairs/triples), which converge in 1–2 rounds, while a
  * pathological 100 TB chain of length 10⁶ still needs only ~20. Lineage is
  * truncated per round with `localCheckpoint` (on a real cluster, swap for
  * reliable `checkpoint`); convergence is detected by an existence probe
  * (`limit(1)` — stops at the first changed label rather than counting all).
  *
  * This is the DataFrame form of the classic MapReduce CC recipe (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14 — the
  * hash-to-min family); no GraphX/RDD dependency, so AQE and codegen apply.
  */
object ConnectedComponents {

  /** Label every vertex with the min id reachable from it.
    *
    * @param edges    undirected edge list (direction is ignored; self-loops
    *                 and duplicates are tolerated)
    * @param srcCol   source-id column name (castable to long)
    * @param dstCol   destination-id column name
    * @param vertices optional extra vertex universe (first column, castable to
    *                 long): isolated vertices not present in any edge get a
    *                 singleton component (their own id)
    * @param maxIter  safety bound; throws if not converged (never hit in
    *                 practice — see the O(log d) argument above)
    * @return (id, comp) with one row per vertex
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          vertices: Option[DataFrame] = None, maxIter: Int = 50): DataFrame = {
    // materialize the raw edge projection ONCE — everything downstream
    // (symmetric closure, endpoint universe, every propagation round) derives
    // from it, and without the checkpoint each consumer would re-execute the
    // (possibly expensive) upstream plan that produced the pairs (e.g. the
    // whole MinHash-LSH pipeline)
    val e = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .localCheckpoint(true)
    val both = e.union(e.select(col("v").as("u"), col("u").as("v")))
    // endpoints BEFORE dropping self-loops: a vertex seen only in a self-loop
    // is still a (singleton) vertex
    val endpoints = both.select(col("u").as("id")).distinct()
    // checkpointed too: every round joins against it, and the distinct is a
    // shuffle worth paying once, not per round
    val sym = both.filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    val verts = vertices match {
      case Some(vs) =>
        vs.select(col(vs.columns.head).cast("long").as("id")).union(endpoints).distinct()
      case None => endpoints
    }

    var labels = verts.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("nc")), "v")
        .groupBy(col("u"))
        .agg(min(col("nc")).as("nbr"))
        .select(col("u").as("id"), col("nbr"))
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
      // comp values are always vertex ids, so the jump lookup is a self-join;
      // the PREVIOUS label rides along so the convergence probe below is a
      // filter on the already-materialized round result — no extra join job
      val jumped = prop.as("x")
        .join(prop.select(col("id").as("jid"), col("comp").as("jc")).as("y"),
          col("x.comp") === col("jid"), "left")
        .select(col("x.id").as("id"), col("x.prev").as("prev"),
          coalesce(col("jc"), col("x.comp")).as("comp"))
        .localCheckpoint(true)
      val changed = jumped.filter(col("comp") =!= col("prev")).limit(1).count()
      labels = jumped.select(col("id"), col("comp"))
      done = changed == 0L
      it += 1
    }
    if (!done)
      throw new IllegalStateException(s"connected components did not converge in $maxIter rounds")
    labels
  }
}
