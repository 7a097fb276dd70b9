package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextDedup
import graft.streaming.CorpusCleanStream

/** The composed streaming cleaner: gates, stateful exact dedup, and per-batch
  * near-dup anti-join against a static index, end-to-end over micro-batches.
  */
class CorpusCleanStreamSpec extends SparkSpec {
  import spark.implicits._

  // English, stopword-dense, long enough to clear a low quality floor;
  // the two novel docs share almost no 3-grams with the indexed doc or
  // each other (near-dup removal must NOT fire on them)
  private val indexed =
    "the quick brown fox and the lazy dog is in the house of the king " +
      "and the queen is in the garden of the castle tonight"
  private val nearDupOfIndexed = indexed + " extra"
  private val novelOne =
    "a merchant is to sell the goods of the market and a sailor is to " +
      "cross the wide sea in a ship of oak and iron"
  private val novelTwo =
    "the teacher is to read a book of old poems and the student is to " +
      "write a long letter in the quiet hall of stone"
  private val german = "der hund ist nicht in das haus und der garten ist nicht da"

  test("streaming cleaner: gates, cross-batch exact dedup, index near-dup removal") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = TextDedup.lshBandedIndex(
      Seq((10L, indexed)).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, rowsPerBand = 2)

    val in = MemoryStream[(Long, String, Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = CorpusCleanStream.run(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 seconds",
      index, qualityFloor = 1000,
      checkpointDir = Files.createTempDirectory("clean-ck").toString,
      rowsPerBand = 2) { clean =>
      val ids = clean.select("doc_id").as[Long].collect()
      got.synchronized { got ++= ids }
      ()
    }

    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    in.addData(Seq(
      (100L, novelOne, ts(0)),            // clean -> survives
      (101L, nearDupOfIndexed, ts(0)),    // near-dup of index doc 10 -> removed
      (102L, german, ts(0))))             // fails the language gate -> removed
    q.processAllAvailable()
    in.addData(Seq(
      (103L, novelOne, ts(2)),            // exact dup of 100 (earlier batch) -> removed
      (104L, novelTwo, ts(2))))           // clean -> survives
    q.processAllAvailable()
    q.stop()

    assert(got.synchronized(got.toList).sorted === List(100L, 104L),
      s"expected survivors 100 and 104; got ${got.sorted}")
  }

  test("streaming cleaner drops benchmark-contaminated docs via the eval shingle set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = TextDedup.lshBandedIndex(
      Seq((10L, indexed)).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, rowsPerBand = 2)
    // benchmark = novelTwo: its 8-gram shingles form the eval set, so any
    // stream doc containing one of its 8-token runs is contaminated
    val evalSet = TextDedup.shingles(
      Seq((900L, novelTwo)).toDF("doc_id", "text"), "doc_id", "text", 8)

    val in = MemoryStream[(Long, String, Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = CorpusCleanStream.run(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 seconds",
      index, qualityFloor = 1000,
      checkpointDir = Files.createTempDirectory("decon-ck").toString,
      rowsPerBand = 2, evalShingles = Some(evalSet)) { clean =>
      val ids = clean.select("doc_id").as[Long].collect()
      got.synchronized { got ++= ids }
      ()
    }

    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    in.addData(Seq(
      (200L, novelOne, ts(0)),   // clean -> survives
      (201L, novelTwo, ts(0)))) // shares all its 8-grams with the benchmark -> dropped
    q.processAllAvailable()
    q.stop()

    assert(got.synchronized(got.toList).sorted === List(200L),
      s"expected only 200 to survive decontamination; got ${got.sorted}")
  }
}
