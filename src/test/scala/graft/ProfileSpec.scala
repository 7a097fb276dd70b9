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

  test("signed zeros count as ONE distinct value in both forms") {
    val df = Seq((1L, 0.0), (2L, -0.0), (3L, 1.0)).toDF("id", "x")
    def cells(p: org.apache.spark.sql.DataFrame) =
      p.as[(String, Long, Long, Long)].collect().toSet
    val expand = cells(graft.operators.Profile.tableProfile(df))
    val unpivot = cells(graft.operators.Profile.tableProfileUnpivot(df))
    assert(expand === unpivot)
    assert(expand.contains(("x", 3L, 0L, 2L)),
      s"0.0 and -0.0 must normalize to one distinct value: $expand")
  }

  test("an empty table profiles as one zero row per column in both forms") {
    val df = Seq((1L, "a")).toDF("id", "s").filter(org.apache.spark.sql.functions.lit(false))
    def cells(p: org.apache.spark.sql.DataFrame) =
      p.as[(String, Long, Long, Long)].collect().toSet
    val expect = Set(("id", 0L, 0L, 0L), ("s", 0L, 0L, 0L))
    assert(cells(graft.operators.Profile.tableProfile(df)) === expect)
    assert(cells(graft.operators.Profile.tableProfileUnpivot(df)) === expect)
    assert(cells(graft.operators.Profile.tableProfileHll(df)) === expect)
  }

  /** The HLL twin's exact lanes (rows, nulls) must equal the exact profile
    * cell-for-cell; the estimate lane is in the collision-free linear-
    * counting regime on a tiny table, so it lands on the exact distincts
    * too — and chunking must be invisible (fixed-state merge).
    */
  test("HLL profile: exact row/null lanes, tiny-regime estimate, chunking-proof") {
    val df = Seq(
        (1L, Option("a"), 1.5), (2L, Option.empty[String], 1.5),
        (2L, Option("b"), 2.25), (3L, Option("a"), 1.5))
      .toDF("id", "name", "score")
    val exact = graft.operators.Profile.tableProfile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def hll(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Profile.tableProfileHll(d)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
    val est = hll(df)
    assert(est.keySet === exact.keySet)
    est.foreach { case (c, (_, n, nn, ed)) =>
      assert((n, nn) === ((exact(c)._2, exact(c)._3)), s"row/null lane drifted for $c")
      assert(ed === exact(c)._4, s"tiny-regime estimate off for $c: $ed vs ${exact(c)._4}")
    }
    assert(hll(df.repartition(7)) === est, "chunking changed the profile")
  }

  /** The 'ANY table' contract under hostile doubles: NaN / ±Infinity /
    * beyond-long magnitudes must profile (string-form hash classes), never
    * throw through Spark 4's ANSI long cast — and the exact lanes and
    * tiny-regime estimate still agree with the exact profiler, including
    * count_distinct's all-NaNs-are-one normalization.
    */
  test("HLL profile survives NaN, infinities, and beyond-long doubles") {
    val df = Seq(
        (1L, Double.NaN), (2L, Double.NaN), (3L, Double.PositiveInfinity),
        (4L, Double.NegativeInfinity), (5L, 9.4e15), (6L, 1.5))
      .toDF("id", "x")
    val exact = graft.operators.Profile.tableProfile(df)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val est = graft.operators.Profile.tableProfileHll(df)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(exact("x")._4 === 5L, "two NaNs must normalize to one class")
    assert(est("x") === exact("x"), s"hostile doubles drifted: ${est("x")} vs ${exact("x")}")
    assert(est("id") === exact("id"))
  }

  test("duplicate column names are rejected by every profile form") {
    val df = Seq((1L, 2L)).toDF("a", "a")
    intercept[IllegalArgumentException](graft.operators.Profile.tableProfile(df))
    intercept[IllegalArgumentException](graft.operators.Profile.tableProfileUnpivot(df))
    intercept[IllegalArgumentException](graft.operators.Profile.tableProfileHll(df))
  }
}
