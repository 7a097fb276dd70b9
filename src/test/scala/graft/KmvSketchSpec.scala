package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.KmvSketch

/** KMV sketch semantics: exact below k, duplicate-insensitive, merge-safe
  * across arbitrary splits, bounded error in the estimating regime, and
  * usable as a grouped Dataset aggregation.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** splitmix64 — deterministic stand-in for xxhash64 in pure-JVM tests. */
  private def h(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def sketchOf(agg: KmvSketch, xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("exact below k: estimate equals the true distinct count") {
    val agg = new KmvSketch(64)
    val xs = (1L to 50L).map(h) ++ (1L to 50L).map(h) // duplicates too
    assert(agg.finish(sketchOf(agg, xs)) === 50L)
  }

  /** Buffers are now an append-log with lazy compaction, so equality is on
    * [[KmvSketch.canonical]] content (sorted distinct k-min set), not raw
    * buffer bytes — the canonical form is what merge/finish consume.
    */
  test("property: duplicate-insensitive and merge-split-invariant") {
    val agg = new KmvSketch(32)
    def eq(a: Array[Long], b: Array[Long]): Boolean =
      java.util.Arrays.equals(agg.canonical(a), agg.canonical(b))
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 200L).map(h))
    check(Prop.forAll(gen) { xs: List[Long] =>
      val serial = sketchOf(agg, xs)
      val doubled = sketchOf(agg, xs ++ xs)
      val splitOk = (1 until xs.size).forall { cut =>
        val (l, r) = xs.splitAt(cut)
        eq(agg.merge(sketchOf(agg, l), sketchOf(agg, r)), serial) &&
          eq(agg.merge(sketchOf(agg, r), sketchOf(agg, l)), serial)
      }
      eq(doubled, serial) && splitOk
    })
  }

  /** The compaction bound: between compactions every insert is an O(1) append
    * (or an O(1) reject against the saturated prefix); a compaction sorts at
    * most k + spare ≈ 2k entries and runs at most once per `spare` appends, so
    * inserts are amortized O(log k). Asserted indirectly: buffers never exceed
    * 2k + header slots even under heavy duplicate pressure.
    */
  test("buffer stays bounded at ~2k under sustained inserts") {
    val k = 64
    val agg = new KmvSketch(k)
    var buf = agg.zero
    (1L to 10000L).foreach(v => buf = agg.reduce(buf, h(v % 997)))
    assert(buf.length <= 2 * k + 2, s"buffer grew to ${buf.length}")
    val est = agg.finish(buf) // estimating regime: 997 distinct, ±3σ ≈ ±38%
    assert(est > 600 && est < 1400, s"estimate $est for 997 distinct")
  }

  test("estimating regime: within ~3 standard errors on 50k distinct values") {
    val k = 256
    val agg = new KmvSketch(k)
    val n = 50000
    val est = agg.finish(sketchOf(agg, (1L to n.toLong).map(h)))
    val rse = 1.0 / math.sqrt(k - 2) // ≈ 6.3%
    val err = math.abs(est - n).toDouble / n
    assert(err < 3 * rse, s"estimate $est for n=$n, err ${err * 100}%")
  }

  /** The sketch as STREAMING state: a grouped typed aggregation in update
    * mode carries the buffer through the state store across micro-batches —
    * the final per-key estimates must equal a one-shot batch aggregation of
    * the same feed (merge-safety under incremental arrival, buffer encoder
    * round-trip through state serialization).
    */
  test("streaming update-mode aggregation equals batch over the same feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val agg = new KmvSketch(64)
    val rows = (1 to 3000).map(i => (s"g${i % 2}", h((i % 431).toLong)))

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val latest = scala.collection.mutable.Map.empty[String, Long]
    val q = in.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("est"))
      .writeStream.outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kmv-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        val updates = b.collect()
        latest.synchronized { updates.foreach { case (k, v) => latest(k) = v } }
        ()
      }
      .start()
    rows.grouped(1000).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()

    val batch = rows.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("est")).collect().toMap
    assert(latest.synchronized(latest.toMap) === batch)
    // 431 distinct hashes split over 2 groups -> saturated (k=64) estimates
    assert(batch.values.forall(v => v > 100 && v < 400), s"estimates: $batch")
  }

  test("grouped Dataset aggregation: exact regime matches count_distinct") {
    val agg = new KmvSketch(4096)
    val rows = (1 to 5000).map(i => (s"g${i % 3}", (i % 700).toLong))
    val hashed = rows.map { case (g, v) => (g, h(v)) } // pre-hash driver-side
    val viaSketch = hashed.toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("est"))
      .collect().toMap
    val exact = rows.distinct.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size.toLong }
    assert(viaSketch === exact)
  }

  /** Regression (ADVICE r4): the estimator must recover the unsigned hash
    * EXACTLY before widening to double. The old path rounded the sign-flipped
    * long at 2^63 magnitude (ulp 1024) first — for the k-th min 512 that
    * rounds to 0 or 1024 before normalization, a 2x-or-worse estimate error —
    * while the DuckDB oracle converts the raw hash directly. hashBits = 60
    * keeps hashes ≤ 2^60, where the flip-back is exactly representable.
    */
  test("estimating regime is bit-identical to direct unsigned widening (hashBits = 60)") {
    val k = 8
    val agg = new KmvSketch(k, hashBits = 60)
    val hashes = (1L to 7L) :+ 512L // k distinct; k-th min = 512
    val est = agg.finish(sketchOf(agg, hashes ++ hashes))
    val expected = math.round((k - 1).toDouble / (512.0 / math.pow(2.0, 60)))
    assert(est === expected)
    assert(est === (7L << 51), s"7 / (512 / 2^60) must be exact; got $est")
  }

  /** [[graft.functions.KmvSketchState]] (the set-op state): finish must be
    * the sorted k smallest DISTINCT raw hashes, duplicate-insensitive and
    * merge-split-invariant — the contract the pairwise union/intersection
    * math in `q_kmv_setops` consumes.
    */
  test("property: state finish = sorted k-min distinct raw hashes, merge-safe") {
    val k = 16
    val st = new graft.functions.KmvSketchState(k, hashBits = 60)
    def stateOf(xs: Seq[Long]): Array[Long] =
      xs.foldLeft(st.zero)((b, v) => st.reduce(b, v))
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))
    check(Prop.forAll(gen) { xs: List[Long] =>
      val expected = xs.distinct.sorted.take(k).toArray
      val serial = st.finish(stateOf(xs))
      val viaMerge = (1 until math.min(xs.size, 6)).forall { cut =>
        val (l, r) = xs.splitAt(cut)
        java.util.Arrays.equals(
          st.finish(st.merge(stateOf(l), stateOf(r))), expected)
      }
      java.util.Arrays.equals(serial, expected) &&
        java.util.Arrays.equals(st.finish(stateOf(xs ++ xs)), expected) &&
        viaMerge
    })
  }

  /** The set-op estimators in the EXACT regime (union < k): p/m·est_union
    * degenerates to the true intersection and union — pinned on a hand case
    * so the estimator formula's exact branch can't drift.
    */
  test("set-op math is exact when the union fits the sketch") {
    val k = 16
    val st = new graft.functions.KmvSketchState(k, hashBits = 60)
    def stateOf(xs: Seq[Long]): Array[Long] =
      xs.foldLeft(st.zero)((b, v) => st.reduce(b, v))
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val b = Seq(4L, 5L, 6L, 7L, 8L)
    val skA = st.finish(stateOf(a))
    val skB = st.finish(stateOf(b))
    val uni = (skA ++ skB).distinct.sorted
    val m = math.min(uni.length, k)
    val p = uni.take(m).count(v => skA.contains(v) && skB.contains(v))
    val estUnion = if (uni.length < k) uni.length.toLong else fail("not exact regime")
    assert(estUnion === 8L)
    assert(p * estUnion / m === 3L)
  }
}
