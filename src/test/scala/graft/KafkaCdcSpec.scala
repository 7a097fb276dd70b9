package graft

import org.apache.spark.sql.Row
import graft.schema.NearSchemas
import graft.sources.KafkaCdc

/** Envelope-normalization coverage: raw Debezium {before, after, op} frames
  * through decode → unwrap must yield the flat `__deleted`-carrying rows the
  * pipeline consumes (the stage the reference delegates to Connect SMTs).
  */
class KafkaCdcSpec extends SparkSpec {
  import spark.implicits._

  private def receiptJson(id: String, deleted: Boolean): String = {
    val row =
      s"""{"receipt_id": "$id", "included_in_block_hash": "b-$id",
          "included_in_chunk_hash": "c-$id", "index_in_chunk": 0,
          "included_in_block_timestamp": 1700000000000000000,
          "predecessor_account_id": "p", "receiver_account_id": "t",
          "receipt_kind": "ACTION", "originated_from_transaction_hash": "tx-$id"}"""
    if (deleted) s"""{"before": $row, "after": null, "op": "d"}"""
    else s"""{"before": null, "after": $row, "op": "c"}"""
  }

  test("decode + unwrapDebezium: creates flat rows, op=d marks __deleted") {
    val frame = Seq(
      ("k1", receiptJson("r1", deleted = false)),
      ("k2", receiptJson("r2", deleted = true)),
      ("k3", """{"before": null, "after": null, "op": "t"}""") // tombstone-ish: dropped
    ).toDF("key", "value")

    val out = KafkaCdc.unwrapDebezium(
      KafkaCdc.decode(frame, KafkaCdc.envelopeSchema(NearSchemas.receipts)),
      NearSchemas.receipts)

    assert(out.columns.toSeq === NearSchemas.receipts.fieldNames.toSeq)
    val rows = out.collect().map(r =>
      (r.getAs[String]("receipt_id"), r.getAs[String]("__deleted"))).toSet
    assert(rows === Set(("r1", "false"), ("r2", "true")))
  }

  test("streaming envelopes: unwrap feeds the watermarked dedup stage") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val receipts = KafkaCdc.unwrapDebezium(
      KafkaCdc.decode(in.toDF().select($"value"),
        KafkaCdc.envelopeSchema(NearSchemas.receipts)),
      NearSchemas.receipts)
    val deduped = graft.operators.TokenPipeline.dedupReceipts(receipts, TokenFixture.cfg)
    assert(deduped.isStreaming)

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = deduped.writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("receipt_id").as[String].collect()
        seen.synchronized { seen ++= ids }
        ()
      }
      .start()
    in.addData(receiptJson("r1", deleted = false))
    q.processAllAvailable()
    // verbatim redelivery of r1 in a later micro-batch + a new record
    in.addData(receiptJson("r1", deleted = false), receiptJson("r2", deleted = false))
    q.processAllAvailable()
    q.stop()
    assert(seen.synchronized(seen.sorted.toList) === List("r1", "r2"))
  }

  test("unwrapped feed drives the pipeline: same columns as the fixture feed") {
    val frame = Seq(("k1", receiptJson("r1", deleted = false))).toDF("key", "value")
    val out = KafkaCdc.unwrapDebezium(
      KafkaCdc.decode(frame, KafkaCdc.envelopeSchema(NearSchemas.receipts)),
      NearSchemas.receipts)
    // must be schema-compatible with the fixture receipts the pipeline consumes
    val fixture = TokenFixture.cleanReceipts(spark)
    assert(out.schema.fieldNames.toSeq === fixture.schema.fieldNames.toSeq)
    val unioned = fixture.unionByName(
      out.select(fixture.columns.map(org.apache.spark.sql.functions.col): _*))
    assert(unioned.count() === fixture.count() + 1)
  }
}
