package graft

/** The two profile formulations (Expand multi-distinct vs unpivot-first)
  * must agree cell-for-cell — including on column names that need
  * identifier/literal escaping (space, quote), the "profiles ANY table"
  * contract the review pass tightened.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("expand and unpivot profiles agree, messy column names included") {
    val df = Seq(
        (1L, Option("a"), 1.5), (2L, Option.empty[String], 1.5),
        (2L, Option("b"), 2.25), (3L, Option("a"), 1.5))
      .toDF("id", "ship date", "a'b")
    def cells(p: org.apache.spark.sql.DataFrame) =
      p.as[(String, Long, Long, Long)].collect().toSet
    val expand = cells(graft.operators.Profile.tableProfile(df))
    val unpivot = cells(graft.operators.Profile.tableProfileUnpivot(df))
    assert(expand === unpivot)
    assert(expand === Set(
      ("id", 4L, 0L, 3L), ("ship date", 4L, 1L, 2L), ("a'b", 4L, 0L, 2L)))
  }
}
