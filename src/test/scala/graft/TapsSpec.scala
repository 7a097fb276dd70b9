package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.{Taps, TokenPipeline}

/** The observation tap must report in-flight metrics without changing data. */
class TapsSpec extends SparkSpec {

  test("tap reports row count and custom metrics of the transfer stream") {
    val transfers = TokenPipeline.transfersFromRaw(TokenFixture.receipts(spark),
      TokenFixture.outcomes(spark), TokenFixture.actions(spark), TokenFixture.cfg)
    val obs = Observation("tx_tap")
    val tapped = Taps.tap(transfers, obs,
      count(lit(1)).as("rows"),
      sum(col("affected_amount")).cast("long").as("net"))
    val n = tapped.count()
    assert(n === 7) // data unchanged
    assert(obs.get("rows") === 7L)
    // net = 1000 + 50 - 30 - 100 + 100 - 25 + 25 = 1020
    assert(obs.get("net") === 1020L)
  }
}
