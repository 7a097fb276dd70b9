package graft

import graft.operators.TokenPipeline
import graft.sources.{SyntheticCdc, Tables}

/** The spec that drives [[StreamBench.runNearPipeline]] — the committed
  * near-pipeline throughput line must come from a harness that (a) really
  * runs the full streaming plan (state operators held rows), (b) counts its
  * input honestly, and (c) emits EXACTLY the batch pipeline's transfer set
  * on the same feed (the parity contract StreamingParitySpec pins, here
  * asserted on the bench path itself so the measured pipe and the verified
  * pipe cannot drift apart).
  */
class StreamBenchSpec extends SparkSpec {

  test("runNearPipeline: metrics populated; transfers equal the batch count") {
    val sfDir = "/root/testdata/sf0.001"
    val r = StreamBench.runNearPipeline(spark, sfDir, chunks = 4)

    assert(r.rowsIn > 0 && r.wallSec > 0 && r.rowsPerSec > 0)
    assert(r.triggers >= 4, s"expected >= 4 data triggers, got ${r.triggers}")
    assert(r.stateRows > 0, "dedup/join state operators held no rows")
    assert(r.meanBatchMs > 0)

    val base = SyntheticCdc.base(Tables(spark, sfDir, "events")).cache()
    try {
      val batch = TokenPipeline.transfersFromRaw(
        SyntheticCdc.receiptsWithDups(base),
        SyntheticCdc.outcomesWithDups(base),
        SyntheticCdc.actionsWithDups(base),
        TokenPipeline.Config(SyntheticCdc.TokenAddress)).count()
      assert(r.rowsOut === batch,
        s"bench emitted ${r.rowsOut} transfers, batch pipeline ${batch}")
      val feedRows = Seq(
        SyntheticCdc.receiptsWithDups(base).count(),
        SyntheticCdc.outcomesWithDups(base).count(),
        SyntheticCdc.actionsWithDups(base).count()).sum
      assert(r.rowsIn === feedRows, "rows_in must count all three topics")
    } finally { base.unpersist(); () }
  }
}
