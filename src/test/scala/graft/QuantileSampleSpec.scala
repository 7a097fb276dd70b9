package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.QuantileSample

/** QuantileSample semantics: the sketch is EXACTLY the k lexicographically
  * smallest (unsigned hash, value) pairs — verified against a brute-force
  * oracle — under any reduce/merge split, its buffer stays bounded, and in
  * the estimating regime order statistics of the sample land within the
  * O(n/√k) rank-error bound.
  */
class QuantileSampleSpec extends SparkSpec {

  /** splitmix64 — deterministic stand-in for the md5-derived row hash. */
  private def h(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def build(agg: QuantileSample, xs: Seq[(Long, Long)]): Array[Long] =
    xs.foldLeft(agg.zero)((b, p) => agg.reduce(b, p))

  /** Brute-force k smallest by (unsigned hash, value) with the same
    * sign-flipped key representation [[QuantileSample.canonical]] exposes.
    */
  private def expected(k: Int, xs: Seq[(Long, Long)]): Array[(Long, Long)] =
    xs.map { case (hk, v) => (hk ^ Long.MinValue, v) }
      .sorted.take(k).toArray

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("exact regime: a group of <= k rows is sampled whole, values sorted") {
    val agg = new QuantileSample(16)
    val xs = (1L to 10L).map(i => (h(i), 100L - i))
    assert(agg.finish(build(agg, xs)).toSeq === (90L to 99L).toSeq)
  }

  test("property: sample is exactly the k smallest pairs under any split") {
    val k = 8
    val agg = new QuantileSample(k)
    val genPair = for {
      hk <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (hk, v)
    val gen = Gen.nonEmptyListOf(genPair)
    check(Prop.forAll(gen) { xs: List[(Long, Long)] =>
      val want = expected(k, xs)
      val serial = agg.canonical(build(agg, xs))
      val splitOk = (1 until xs.size).forall { cut =>
        val (l, r) = xs.splitAt(cut)
        val m = agg.canonical(agg.merge(build(agg, l), build(agg, r)))
        val mRev = agg.canonical(agg.merge(build(agg, r), build(agg, l)))
        m.sameElements(want) && mRev.sameElements(want)
      }
      serial.sameElements(want) && splitOk
    })
  }

  test("buffer stays bounded at ~2k pairs under sustained inserts") {
    val k = 64
    val agg = new QuantileSample(k)
    var buf = agg.zero
    (1L to 20000L).foreach(i => buf = agg.reduce(buf, (h(i), i % 1000)))
    assert(buf.length <= 2 + 2 * 2 * k, s"buffer grew to ${buf.length}")
    assert(agg.canonical(buf).length === k)
  }

  test("estimating regime: sampled median within the rank-error bound") {
    val k = 256
    val n = 50000
    val agg = new QuantileSample(k)
    // values 1..n in random hash order; true median = n/2
    val buf = build(agg, (1L to n.toLong).map(i => (h(i), i)))
    val vals = agg.finish(buf)
    assert(vals.length === k)
    val p50 = vals((k + 1) / 2 - 1)
    // rank error ~ n/sqrt(k) per Hoeffding; 3 sigma ≈ 3n/(2 sqrt(k)) ≈ 4700
    assert(math.abs(p50 - n / 2) < 3.0 * n / (2 * math.sqrt(k)),
      s"sampled p50 $p50 vs true ${n / 2}")
  }

  test("QuantileMerge over per-source states equals one sketch over the union") {
    import graft.functions.{QuantileMerge, QuantileSampleState}
    val k = 16
    val agg = new QuantileSample(k)
    val state = new QuantileSampleState(k)
    val merger = new QuantileMerge(k)
    // three overlapping sources; values correlate with hash keys differently
    val sources = Seq(
      (1L to 400L).map(i => (h(i), i)),
      (200L to 700L).map(i => (h(i), i)),
      (650L to 900L).map(i => (h(2 * i), 1000L - i)))
    val states = sources.map(xs =>
      state.finish(xs.foldLeft(state.zero)((b, p) => state.reduce(b, p))))
    states.foreach(st => assert(st.length <= 2 + 2 * k, "state not compacted"))
    val merged = states.foldLeft(merger.zero)((b, st) => merger.reduce(b, st))
    val direct = build(agg, sources.flatten)
    assert(agg.canonical(merged).sameElements(agg.canonical(direct)),
      "merged sample differs from direct k-smallest of the union")
    assert(merger.finish(merged).toSeq === agg.finish(direct).toSeq)
  }
}
