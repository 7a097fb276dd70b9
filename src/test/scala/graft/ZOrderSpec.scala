package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: bit-level correctness of the interleave against a
  * reference bit loop, exactness of the grid scaling against BigInt floor
  * division, and the layout claim itself — a z-clustered parquet directory
  * prunes on EITHER dimension where a single-key sort prunes on one.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: the obvious bit loop. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave equals the reference bit loop on random coordinates") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val coord = Gen.choose(0L, (1L << 16) - 1)
    val prop = Prop.forAll(Gen.listOfN(64, Gen.zip(coord, coord))) { pts =>
      val got = pts.toDF("x", "y")
        .select(ZOrder.interleave(col("x"), col("y")).as("z"))
        .as[Long].collect().toSeq
      got == pts.map { case (x, y) => mortonRef(x, y) }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"interleave diverged from bit loop: ${res.status}")
    // the curve is a bijection on the grid: 2^8 × 2^8 cells -> 2^16 distinct z
    val n = spark.range(1L << 16)
      .select(ZOrder.interleave(col("id") % 256, shiftright(col("id"), 8)).as("z"))
      .distinct().count()
    assert(n == (1L << 16))
  }

  test("gridCoord is exact integer floor division and spans the full grid") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // spans up to the documented 2^37 ANSI/exactness bound
    val span = Gen.choose(1L, 1L << 37)
    val prop = Prop.forAll(span, Gen.choose(0L, 1L << 20)) { (sp, off) =>
      val mn = off
      val mx = off + sp - 1
      val cs = Seq(mn, mx, mn + sp / 2, mn + sp / 3, mn + (sp * 7) / 11).distinct
      val got = cs.toDF("c")
        .select(ZOrder.gridCoord(col("c"), lit(mn), lit(mx)).as("g"))
        .as[Long].collect().toSeq
      val want = cs.map(c => ((BigInt(c - mn) * 65536) / BigInt(sp)).toLong)
      got == want && got.head == 0L &&
        (sp < 65536 || got(1) == 65535L) // max maps to the top cell
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, s"gridCoord diverged from BigInt division: ${res.status}")
  }

  test("z-clustered layout prunes both dimensions; a single-key sort prunes one") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try testLayout(dir)
    finally { // deleteOnExit can't remove non-empty dirs — clean recursively
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  private def testLayout(dir: java.io.File): Unit = {
    val nFiles = 16
    // 256×256 uniform grid — every (x, y) cell once; grid normalization is
    // identity up to scaling, so the layout quality is purely the curve's
    val pts = spark.range(1L << 16)
      .select((col("id") % 256).as("x"), shiftright(col("id"), 8).as("y"))
    val zdf = pts.withColumn("z",
      ZOrder.zValue(col("x"), lit(0L), lit(255L), col("y"), lit(0L), lit(255L)))
    ZOrder.writeClustered(zdf.select("x", "y", "z"), col("z"), nFiles, s"$dir/z")
    ZOrder.writeClustered(pts, col("x"), nFiles, s"$dir/xsort")

    def stats(path: String) =
      ZOrder.fileStats(spark.read.parquet(path), Seq("x", "y"))
        .select("n_rows", "min_x", "max_x", "min_y", "max_y")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val zStats = stats(s"$dir/z")
    val xStats = stats(s"$dir/xsort")
    assert(zStats.length == nFiles && xStats.length == nFiles)
    // range partitioning balances rows under z-skew (sampled boundaries)
    assert(zStats.map(_._1).max <= 3 * (1L << 16) / nFiles)

    // a pruning reader skips files whose [min, max] misses the predicate;
    // y-band = the filter a single-x-sort layout cannot prune at all
    def touched(st: Seq[(Long, Long, Long, Long, Long)],
                xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      st.count { case (_, mnx, mxx, mny, mxy) =>
        xr.forall { case (lo, hi) => mxx >= lo && mnx <= hi } &&
          yr.forall { case (lo, hi) => mxy >= lo && mny <= hi }
      }
    val yBand = touched(zStats, None, Some((0L, 31L))) // low 1/8 of y
    assert(yBand <= nFiles / 2, s"z layout read $yBand/$nFiles files for a y band")
    assert(touched(xStats, None, Some((0L, 31L))) == nFiles) // x-sort: full scan
    // both layouts prune an x band; z pays at most a small constant more
    val xBandZ = touched(zStats, Some((0L, 31L)), None)
    val xBandX = touched(xStats, Some((0L, 31L)), None)
    assert(xBandX <= nFiles / 4 && xBandZ <= nFiles / 2)
    // 2-D box: the z curve bounds BOTH extents per file
    val box = touched(zStats, Some((0L, 63L)), Some((0L, 63L)))
    assert(box <= nFiles / 2, s"z layout read $box/$nFiles files for a 1/16 box")
  }
}
