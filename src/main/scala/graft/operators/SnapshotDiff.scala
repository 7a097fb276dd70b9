package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the BATCH form of the reference's CDC identity
  * (KafkaCdc normalizes a live changelog; this derives the same
  * added/removed/changed classification from two materialized snapshots).
  * The operation a recurring 100 TB pipeline runs between crawls: classify
  * every document id across (previous, current) so downstream stages — dedup
  * index maintenance, embedding refresh, decontamination re-checks — touch
  * only the changed slice instead of recomputing the corpus.
  *
  * Shape: each side reduces to (id, content-hash) — a narrow projection, the
  * wide content column never crosses the shuffle — then ONE full-outer
  * equi-join on the id decides the status. With both snapshots written
  * through [[graft.sinks.Bucketing]] on the id the join is zero-exchange
  * (the co-partitioned-snapshots contract); otherwise it is a single
  * hash-partitioned shuffle of two hash columns.
  */
object SnapshotDiff {

  /** Classify every id across two snapshots of an id-keyed corpus.
    *
    * @param prev       previous snapshot
    * @param cur        current snapshot
    * @param idCol      id column present in both
    * @param contentCol content column compared by md5
    * @return (idCol, status) with status ∈ added | removed | changed | unchanged
    */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("id"), md5(col(contentCol).cast("binary")).as("ph"))
    val c = cur.select(col(idCol).as("id"), md5(col(contentCol).cast("binary")).as("ch"))
    p.join(c, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("ph").isNull, "added")
          .when(col("ch").isNull, "removed")
          .when(col("ph") =!= col("ch"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
