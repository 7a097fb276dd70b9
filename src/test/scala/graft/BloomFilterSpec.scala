package graft

import org.apache.spark.sql.functions.{broadcast, col, explode}
import graft.functions.{BloomBitsetAgg, BloomFilter}
import graft.operators.TextDedup

/** The Bloom membership contract the decontamination path rests on: no false
  * negatives ever (every inserted item tests positive), determinism, and a
  * plausible false-positive rate at the configured sizing.
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def filterOf(items: Seq[String]) = items.toDF("s")
    .select(explode(BloomFilter.positionsArray(
      TextDedup.tokenHash60(col("s")))).as("pos"))
    .as[Long]
    .select(new BloomBitsetAgg().toColumn.name("bits"))

  test("no false negatives: every inserted item tests positive") {
    val items = (0 until 500).map(i => s"item-$i")
    val hits = items.toDF("s").crossJoin(broadcast(filterOf(items)))
      .filter(BloomFilter.mightContain(col("bits"), TextDedup.tokenHash60(col("s"))))
      .count()
    assert(hits === 500L)
  }

  test("membership is deterministic and false positives stay rare at sizing") {
    val inserted = (0 until 1000).map(i => s"in-$i")
    val probes = (0 until 2000).map(i => s"out-$i")
    def fpCount: Long = probes.toDF("s").crossJoin(broadcast(filterOf(inserted)))
      .filter(BloomFilter.mightContain(col("bits"), TextDedup.tokenHash60(col("s"))))
      .count()
    val a = fpCount
    assert(a === fpCount) // same filter, same verdicts
    // k=2, n=2000 positions over m=2^19 bits → fp ≈ (n/m)^2 ≈ 1.5e-5; 2000
    // probes should essentially never collide, but allow a handful
    assert(a <= 3, s"false-positive count implausibly high: $a")
  }

  test("merge is order-insensitive: split build equals single build") {
    val items = (0 until 400).map(i => s"m-$i")
    val whole = filterOf(items).head()
    val parts = filterOf(items.reverse).head()
    assert(whole.toSeq === parts.toSeq)
  }
}
