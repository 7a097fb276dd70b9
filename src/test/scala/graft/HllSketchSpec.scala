package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.HllSketch

/** HllSketch semantics: registers are exactly the per-bucket minimum
  * remainders (verified against a brute-force oracle under any reduce/merge
  * split), updates are duplicate-insensitive, and the harmonic-mean estimate
  * lands within the standard 1.04/√m error band in the estimating regime.
  */
class HllSketchSpec extends SparkSpec {

  /** 60-bit deterministic hash — same domain as TextDedup.tokenHash60. */
  private def h60(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) >>> 4
  }

  private def build(agg: HllSketch, xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))

  /** Brute-force register state: min remainder per low-8-bit bucket. */
  private def expected(xs: Seq[Long]): Array[Long] = {
    val regs = Array.fill(256)(Long.MaxValue)
    xs.foreach { x =>
      val r = (x & 255).toInt
      val w = x >>> 8
      if (w < regs(r)) regs(r) = w
    }
    regs
  }

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("property: registers equal the brute-force minima under any split") {
    val agg = new HllSketch(60)
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))
    check(Prop.forAll(gen) { xs: List[Long] =>
      val want = expected(xs)
      val serial = build(agg, xs)
      val splits = List(1, xs.size / 2, xs.size - 1).filter(c => c > 0 && c < xs.size)
      serial.sameElements(want) && splits.forall { cut =>
        val (l, r) = xs.splitAt(cut)
        agg.merge(build(agg, l), build(agg, r)).sameElements(want) &&
        agg.merge(build(agg, r), build(agg, l)).sameElements(want)
      }
    })
  }

  test("duplicate-insensitive: re-feeding the stream changes nothing") {
    val agg = new HllSketch(60)
    val xs = (1L to 500L).map(h60)
    val once = build(agg, xs)
    val thrice = build(agg, xs ++ xs ++ xs)
    assert(once.sameElements(thrice))
    assert(agg.finish(once) === agg.finish(thrice))
  }

  test("small regime: linear counting tracks tiny cardinalities closely") {
    val agg = new HllSketch(60)
    for (n <- Seq(5, 10, 50, 120)) {
      val est = agg.finish(build(agg, (1L to n.toLong).map(h60)))
      // linear counting rel-error ~ sqrt(m)/V-ish; generous 20% + 2 band
      assert(math.abs(est - n) <= math.max(2, n / 5),
        s"n=$n estimated $est")
    }
  }

  test("linear-counting outputs sit far from rounding boundaries (all 255 V)") {
    // the cross-engine-determinism argument in the class doc, executed: every
    // possible correction value is >= 0.004 from a .5 boundary on this JVM
    val worst = (1 until 256).map { v =>
      val est = 256 * math.log(256.0 / v)
      math.abs((est % 1.0) - 0.5)
    }.min
    assert(worst > 0.004, s"worst distance to rounding boundary: $worst")
  }

  test("estimating regime: within 3 sigma of 1.04/sqrt(256)") {
    val agg = new HllSketch(60)
    val n = 100000
    val est = agg.finish(build(agg, (1L to n.toLong).map(h60)))
    val sigma = 1.04 / math.sqrt(256.0)
    assert(math.abs(est - n).toDouble / n < 3 * sigma,
      s"estimate $est vs true $n (rel ${math.abs(est - n).toDouble / n})")
  }

  test("harmonic sum is exact-integer and finish matches the oracle order") {
    val agg = new HllSketch(60)
    val buf = build(agg, (1L to 1000L).map(h60))
    val s = agg.harmonicSumInt(buf)
    val alpha = 0.7213 / (1 + 1.079 / 256.0)
    assert(agg.finish(buf) === math.round(alpha * 5.90295810358705651712e20 / s.toDouble))
  }

  test("HllMerge over per-source states equals one sketch over the union") {
    import graft.functions.{HllMerge, HllSketchState}
    val agg = new HllSketch(60)
    val state = new HllSketchState(60)
    val merger = new HllMerge(60)
    // overlapping sources, so mergeability ≠ additivity is actually exercised
    val sources = Seq((1L to 800L).map(h60), (400L to 1200L).map(h60),
      (1000L to 1500L).map(h60))
    val states = sources.map(xs => xs.foldLeft(state.zero)((b, x) => state.reduce(b, x)))
    val merged = states.foldLeft(merger.zero)((b, st) => merger.reduce(b, st))
    val direct = build(agg, sources.flatten)
    assert(merged.sameElements(direct), "merged registers differ from direct build")
    assert(merger.finish(merged) === agg.finish(direct))
  }
}
