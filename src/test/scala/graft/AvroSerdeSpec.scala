package graft

import java.math.BigDecimal

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.schema.NearSchemas
import graft.sinks.KafkaFrames
import graft.sources.{AvroSerde, KafkaCdc}

/** The Avro serde path (SURVEY.md §2 #1/#11): schema derivation, encode →
  * decode round-trip with decimals and nulls, registry wire framing, and
  * equivalence with the JSON serde path — so a connected deployment can flip
  * from `decode` to `decodeAvro` (or let the classpath probe pick the native
  * `from_avro`) with no behavior change. All assertions hold for BOTH probe
  * outcomes: the suite exercises whichever path the classpath provides.
  */
class AvroSerdeSpec extends SparkSpec {

  private def dec(s: String) = new BigDecimal(s)

  // 45-digit-capable decimal column exercised at DecimalType(38,0)'s edge
  private val rows = Seq(
    Row("r1", "b1", "c1", 0, dec("1700000000000000000"), "p1", "oct.token",
      "ACTION", "tx1", null),
    Row("r2", "b2", null, 3, dec("1700000000000000999"), "p2", "oct.token",
      "ACTION", "tx2", "false"),
    Row("r3", null, "c3", 7, dec("99999999999999999999"), "p3", "other.token",
      "DATA", "tx3", "true"))

  private def receiptsDf =
    spark.createDataFrame(rows.asJava, NearSchemas.receipts)

  test("schema derivation: valid Avro record with decimal logical types and null unions") {
    val json = AvroSerde.avroSchemaJson(NearSchemas.receipts, "receipts_value")
    val parsed = new org.apache.avro.Schema.Parser().parse(json)
    assert(parsed.getType === org.apache.avro.Schema.Type.RECORD)
    assert(parsed.getFields.size === NearSchemas.receipts.fields.length)
    val rid = parsed.getField("receipt_id").schema()
    assert(rid.getType === org.apache.avro.Schema.Type.STRING) // non-nullable: no union
    val ts = parsed.getField("included_in_block_timestamp").schema()
    assert(ts.getType === org.apache.avro.Schema.Type.UNION) // nullable
    val tsInner = ts.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).get
    assert(tsInner.getType === org.apache.avro.Schema.Type.BYTES)
    assert(tsInner.getLogicalType.getName === "decimal")
  }

  test("encode -> decode round-trip preserves rows (decimals, nulls, framing off)") {
    val frame = AvroSerde.sinkFrame(receiptsDf, Seq("receipt_id"), "t",
      registryFraming = false)
    assert(frame.columns.toSeq === Seq("key", "value", "topic"))
    val back = AvroSerde.decode(frame, NearSchemas.receipts, registryFraming = false)
    assert(back.schema === NearSchemas.receipts)
    assert(back.collect().toSet === receiptsDf.collect().toSet)
  }

  test("registry framing: 0x00 magic + big-endian schema id precede the Avro body") {
    val frame = AvroSerde.sinkFrame(receiptsDf, Seq("receipt_id"), "t",
      registryFraming = true, schemaId = 7)
    val value = frame.filter(col("key").cast("string") === "r1")
      .select("value").head.getAs[Array[Byte]](0)
    assert(value(0) === 0.toByte)
    assert(java.nio.ByteBuffer.wrap(value, 1, 4).getInt === 7)
    val back = AvroSerde.decode(frame, NearSchemas.receipts, registryFraming = true)
    assert(back.collect().toSet === receiptsDf.collect().toSet)
  }

  test("Avro and JSON serde paths produce identical frames") {
    val viaJson = KafkaCdc.decode(
      KafkaFrames.toKafkaFrame(receiptsDf, Seq("receipt_id"), "t"),
      NearSchemas.receipts)
    val viaAvro = KafkaCdc.decodeAvro(
      KafkaFrames.toKafkaFrameAvro(receiptsDf, Seq("receipt_id"), "t"),
      NearSchemas.receipts)
    // from_json yields all-nullable fields; the Avro side preserves
    // nullable=false on receipt_id — names and types must agree, values exactly
    assert(viaAvro.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      viaJson.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(viaAvro.collect().toSet === viaJson.collect().toSet)
  }

  test("Debezium envelopes survive the Avro serde: decode -> unwrap parity with JSON") {
    val env = KafkaCdc.envelopeSchema(NearSchemas.receipts)
    val envRows = rows.map(r => Row(null, r, "c")) :+ Row(rows.head, null, "d")
    val envDf = spark.createDataFrame(envRows.asJava, env)
    val frame = AvroSerde.sinkFrame(envDf, Seq("op"), "t") // key irrelevant here
    val out = KafkaCdc.unwrapDebezium(KafkaCdc.decodeAvro(frame, env), NearSchemas.receipts)
    val got = out.collect().map(r =>
      (r.getAs[String]("receipt_id"), r.getAs[String]("__deleted"))).toSet
    assert(got === Set(("r1", "false"), ("r2", "false"), ("r3", "false"), ("r1", "true")))
  }

  /** Randomized round-trip: arbitrary unicode strings, nulls in every
    * nullable slot, and decimals spanning the full DecimalType(38,0) /
    * (20,0) ranges (including negatives, which exercise the two's-complement
    * unscaled-bytes encoding) must survive encode → decode bit-exactly.
    * Raw scalacheck (no scalatestplus bridge — build constraint).
    */
  test("property: random rows round-trip through the Avro serde") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genStr = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.const("späßchen-ünïcode-€"),
      Gen.const(""))
    val genOptStr = Gen.oneOf(genStr.map(identity[Any]), Gen.const(null: Any))
    val genTs = Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4)
      .map(n => new BigDecimal(n))
    val genRow = for {
      id <- Gen.alphaNumStr.map(s => "r" + s.take(12))
      blk <- genOptStr; chk <- genOptStr
      idx <- Gen.chooseNum(-1000000, 1000000)
      ts <- genTs
      pred <- genOptStr; recv <- genOptStr; kind <- genOptStr; tx <- genOptStr
      del <- Gen.oneOf[Any](null, "true", "false")
    } yield Row(id, blk, chk, idx, ts, pred, recv, kind, tx, del)

    val prop = Prop.forAll(Gen.listOfN(5, genRow)) { rows =>
      val df = spark.createDataFrame(rows.asJava, NearSchemas.receipts)
      val back = AvroSerde.decode(
        AvroSerde.sinkFrame(df, Seq("receipt_id"), "t", registryFraming = false),
        NearSchemas.receipts, registryFraming = false)
      back.collect().toSet == df.collect().toSet
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("schema registry seam: ids round-trip, idempotent registration") {
    val reg = new graft.sources.InMemorySchemaRegistry
    val json = AvroSerde.avroSchemaJson(NearSchemas.receipts, "sink_value")
    val id1 = reg.register("receipts-value", json)
    assert(id1 === 1) // Confluent convention: ids start at 1
    assert(reg.register("receipts-value", json) === id1, "re-registration must be idempotent")
    val other = AvroSerde.avroSchemaJson(NearSchemas.receipts, "other_value")
    assert(reg.register("other-value", other) === 2)
    assert(reg.schemaById(id1) === json)
    intercept[NoSuchElementException](reg.schemaById(99))
  }

  test("sinkFrameRegistered -> decodeRegistered round-trips via the registry id") {
    val reg = new graft.sources.InMemorySchemaRegistry
    val frame = AvroSerde.sinkFrameRegistered(receiptsDf, Seq("receipt_id"), "t",
      "receipts-value", reg)
    // the frame carries the id the registry handed out, not a fixed stand-in
    val value = frame.filter(col("key").cast("string") === "r1")
      .select("value").head.getAs[Array[Byte]](0)
    assert(java.nio.ByteBuffer.wrap(value, 1, 4).getInt === 1)
    val back = AvroSerde.decodeRegistered(frame, NearSchemas.receipts, reg)
    assert(back.collect().toSet === receiptsDf.collect().toSet)
  }

  test("decodeRegistered resolves an evolved reader schema (added defaulted field)") {
    val reg = new graft.sources.InMemorySchemaRegistry
    val frame = AvroSerde.sinkFrameRegistered(receiptsDf, Seq("receipt_id"), "t",
      "receipts-value", reg)
    // reader adds a nullable column the writer never had: Avro resolution
    // fills the default (null) instead of failing or misaligning fields
    val evolved = org.apache.spark.sql.types.StructType(
      NearSchemas.receipts.fields :+
        org.apache.spark.sql.types.StructField("new_col",
          org.apache.spark.sql.types.StringType, nullable = true))
    val back = AvroSerde.decodeRegistered(frame, evolved, reg)
    assert(back.schema === evolved)
    assert(back.filter(col("new_col").isNotNull).count() === 0L)
    assert(back.drop("new_col").collect().toSet === receiptsDf.collect().toSet)
  }

  test("classpath probe is deterministic and decode dispatches without error") {
    // In this sandbox only avro core + the Avro file connector are present; a
    // connected deployment's spark-avro jar flips the probe and the same calls
    // hit native from_avro/to_avro. The probe must target the expression impl
    // class — the `functions` API object exists (as a throwing stub) either way.
    val expected =
      try { Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst"); true }
      catch { case _: ClassNotFoundException => false }
    assert(AvroSerde.sparkAvroPresent === expected)
  }
}
