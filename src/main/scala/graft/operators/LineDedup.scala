package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the dedup granularity between
  * [[SpanScrub]] (token windows) and document-level dedup: a LINE that
  * recurs across many documents (navigation bars, cookie banners, licence
  * headers, footers) is template boilerplate, not content, and a training
  * corpus wants it dropped while the surrounding document survives. This is
  * the CCNet/RefinedWeb-style line filter: hash each line, count the
  * DISTINCT documents containing it, drop lines at or above the
  * boilerplate threshold, and rejoin the remainder in original order.
  *
  * Within-document repetition deliberately does NOT count toward the
  * threshold (a line pasted five times in one page is repetition —
  * `q_repetition`'s domain — not cross-document boilerplate).
  *
  * Scale shape (same relational skeleton as [[SpanScrub.scrubCorpus]],
  * keyed on the line hash): one narrow line fan-out, ONE shuffle on the
  * md5 line key for the distinct-doc count, an anti-join back, and a
  * per-doc ordered rebuild — a line shared by k documents costs O(k) rows,
  * never O(k²), and nothing ever shuffles on the document body.
  */
object LineDedup {

  /** (doc_id, i, line, h) — every line of every page with its 1-based
    * position and md5 key.
    */
  def docLines(d: DataFrame, idCol: String, pageCol: String): DataFrame =
    d.select(col(idCol).as("doc_id"), posexplode(split(col(pageCol), "\n")).as(Seq("p0", "line")))
      .select(col("doc_id"), (col("p0") + 1).as("i"), col("line"),
        md5(col("line").cast("binary")).as("h"))

  /** md5 keys of lines occurring in ≥ `minDocs` DISTINCT documents — the
    * boilerplate set (small: bounded by templates, not corpus size).
    */
  def boilerplateLines(d: DataFrame, idCol: String, pageCol: String,
                       minDocs: Int): DataFrame =
    docLines(d, idCol, pageCol)
      .groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")

  /** The boilerplate index of a static REFERENCE corpus — the template
    * vocabulary an ingest gate scrubs against. [[Lineage.cut]] at build
    * (the `SpanScrub.dupIndex` convention) so streaming triggers reuse the
    * materialized key set instead of re-counting the reference corpus per
    * micro-batch. The threshold is learned FROM the reference (a line must
    * recur across ≥ `minDocs` reference documents) — unlike the span
    * probe's membership-alone rule, because a single occurrence of a line
    * in the reference is ordinary content, not evidence of a template.
    */
  def boilerplateIndex(reference: DataFrame, idCol: String, pageCol: String,
                       minDocs: Int): DataFrame =
    Lineage.cut(boilerplateLines(reference, idCol, pageCol, minDocs))

  /** Drop every line whose md5 key is in `boilerH`, rejoin the rest in
    * order. Output: (doc_id, n_lines, n_kept, cleaned).
    */
  def dedupWith(d: DataFrame, idCol: String, pageCol: String,
                boilerH: DataFrame): DataFrame = {
    val kept = docLines(d, idCol, pageCol)
      .join(boilerH, Seq("h"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(i, line))), x -> x.line)"),
          "\n").as("cleaned"))
    d.select(col(idCol).as("doc_id"),
        size(split(col(pageCol), "\n")).cast("long").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Self-dedup of one corpus: drop lines occurring in ≥ `minDocs` distinct
    * documents of the corpus itself, rejoin the rest in order.
    */
  def dedupLines(d: DataFrame, idCol: String, pageCol: String,
                 minDocs: Int): DataFrame =
    dedupWith(d, idCol, pageCol, boilerplateLines(d, idCol, pageCol, minDocs))
}
