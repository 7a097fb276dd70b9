package graft

import graft.operators.LineDedup

/** Line-level boilerplate dedup ([[graft.operators.LineDedup]]): threshold
  * boundary, within-document repetition exemption, and order preservation.
  */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private def result(d: org.apache.spark.sql.DataFrame, minDocs: Int) =
    LineDedup.dedupLines(d, "doc_id", "page", minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a line in >= minDocs distinct docs is dropped; one fewer is kept") {
    // 'banner' in docs 1,2,3; 'promo' in docs 1,2 only
    val d = Seq(
      (1L, "banner\npromo\nbody one"),
      (2L, "banner\npromo\nbody two"),
      (3L, "banner\nbody three")).toDF("doc_id", "page")
    val at3 = result(d, 3)
    assert(at3(1L) == ((3L, 2L, "promo\nbody one")), s"got ${at3(1L)}")
    assert(at3(3L) == ((2L, 1L, "body three")))
    val at2 = result(d, 2) // promo now boilerplate too
    assert(at2(1L) == ((3L, 1L, "body one")))
  }

  test("within-document repetition does not count toward the threshold") {
    // 'chorus' appears 3x in doc 1 but only in 1 distinct doc -> kept
    val d = Seq(
      (1L, "chorus\nverse\nchorus\nchorus"),
      (2L, "other\nlines")).toDF("doc_id", "page")
    val r = result(d, 2)
    assert(r(1L) == ((4L, 4L, "chorus\nverse\nchorus\nchorus")))
  }

  test("kept lines preserve original order and a fully-boilerplate doc empties") {
    val d = Seq(
      (1L, "x\na\nx\nb\nx"),
      (2L, "x\nc"),
      (3L, "x")).toDF("doc_id", "page")
    val r = result(d, 3)
    assert(r(1L) == ((5L, 2L, "a\nb")), "order lost or wrong lines dropped")
    assert(r(3L) == ((1L, 0L, "")), "fully-boilerplate doc must go empty, not vanish")
  }

  test("registered q_line_dedup drops the planted families and keeps body + ref") {
    val out = graft.queries.TextQueries.lineDedup(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 2L,
        s"expected 2 of 5 lines kept, got $r")
      val lines = r.getString(3).split("\n")
      assert(lines.last == s"ref trace ${r.getLong(0)}")
    }
  }
}
