package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro value serde for the Kafka source/sink adapters — the reference's
  * actual wire format (reference: Schemas.java:89-136 builds
  * SpecificAvroSerde values against a schema registry; registry wiring
  * pom.xml:199-244). Closes SURVEY.md §2 #1/#11's serde gap:
  *
  *   - **classpath probe**: when the `spark-avro` module is on the classpath
  *     ([[sparkAvroPresent]]), [[decode]]/[[sinkFrame]] dispatch to the native
  *     codegen'd `from_avro`/`to_avro` expressions via reflection — a
  *     connected deployment needs zero code edits, just the standard
  *     `--packages org.apache.spark:spark-avro_2.13` submit flag;
  *   - **core-avro fallback**: without the module (this sandbox ships only
  *     avro core), the same calls run a `mapPartitions` serde using
  *     `GenericDatumReader`/`GenericDatumWriter` — decoder/encoder instances
  *     are reused across the partition, so the per-row cost matches what
  *     spark-avro's own deserializer does outside codegen. Both paths produce
  *     identical frames (spec-asserted), so the fallback is an executable
  *     stand-in, not a stub.
  *
  * Schemas are derived from the pipeline's `StructType`s ([[avroSchemaJson]])
  * rather than checked-in `.avsc` files — the StructTypes in
  * [[graft.schema.NearSchemas]] already mirror the reference's six value
  * schemas field-for-field, so deriving keeps one source of truth. Confluent
  * registry framing (magic 0x00 + 4-byte schema id before the Avro body) is
  * handled by `registryFraming`, matching the registry serde's wire layout.
  */
object AvroSerde {

  /** Confluent wire-format header: magic byte 0x00 + big-endian schema id. */
  val RegistryHeaderLen = 5

  private def registryHeader(schemaId: Int): Array[Byte] =
    Array[Byte](0, (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte)

  /** True when the spark-avro connector (native `from_avro`/`to_avro`
    * expressions) is on the classpath. The probe targets the expression
    * implementation class, NOT `o.a.s.sql.avro.functions` — Spark 4 ships
    * that API object (and the Avro FILE connector) in spark-sql itself as a
    * stub that throws `avroNotLoadedSqlFunctionsUnusable` unless the
    * connector jar provides the expressions.
    */
  lazy val sparkAvroPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst"); true }
    catch { case _: ClassNotFoundException => false }

  private def nativeAvroFn(name: String, value: Column, schemaJson: String): Column = {
    val cls = Class.forName("org.apache.spark.sql.avro.functions$")
    val mod = cls.getField("MODULE$").get(null)
    cls.getMethod(name, classOf[Column], classOf[String])
      .invoke(mod, value, schemaJson).asInstanceOf[Column]
  }

  // ---------------------------------------------------------------- schema

  /** Avro record schema (JSON) for a StructType: nullable fields become
    * `["null", T]` unions with null defaults, DecimalType becomes the
    * bytes+decimal logical type (the Debezium encoding of `numeric(20,0)` /
    * `numeric(45,0)` — reference avsc files carry exactly this shape).
    * Nested record names are path-qualified for uniqueness.
    */
  def avroSchemaJson(schema: StructType, recordName: String): String = {
    val json = recordJson(schema, recordName, topLevel = true)
    new Schema.Parser().parse(json) // validate eagerly; throws on bad names
    json
  }

  private def recordJson(st: StructType, name: String, topLevel: Boolean): String = {
    val ns = if (topLevel) """"namespace":"graft.cdc",""" else ""
    val fields = st.fields.map { f =>
      val t = avroType(f.dataType, s"${name}_${f.name}")
      val tt = if (f.nullable) s"""["null",$t]""" else t
      val dflt = if (f.nullable) ""","default":null""" else ""
      s"""{"name":"${f.name}","type":$tt$dflt}"""
    }.mkString(",")
    s"""{"type":"record",$ns"name":"$name","fields":[$fields]}"""
  }

  private def avroType(dt: DataType, path: String): String = dt match {
    case StringType => "\"string\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case BooleanType => "\"boolean\""
    case BinaryType => "\"bytes\""
    case d: DecimalType =>
      s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
    case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case st: StructType => recordJson(st, path, topLevel = false)
    case ArrayType(et, containsNull) =>
      val inner = avroType(et, s"${path}_item")
      val items = if (containsNull) s"""["null",$inner]""" else inner
      s"""{"type":"array","items":$items}"""
    case other => throw new IllegalArgumentException(s"unsupported Avro mapping: $other")
  }

  // ------------------------------------------------------------- converters

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toRowValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (bb: ByteBuffer, d: DecimalType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (bb: ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      bytes
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue, 1000000L), Math.floorMod(l.longValue, 1000000L) * 1000))
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue))
    case (r: GenericRecord, st: StructType) => toRow(r, st)
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.map(toRowValue(_, et)).toSeq
    case (other, _) => other // int/long/double/float/boolean pass through
  }

  private def toRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toIndexedSeq.map(f => toRowValue(rec.get(f.name), f.dataType)))

  private def toAvroValue(v: Any, fieldSchema: Schema, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue.toByteArray)
    case (d: scala.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.underlying.setScale(dec.scale).unscaledValue.toByteArray)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (ts: java.sql.Timestamp, TimestampType) =>
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    case (dte: java.sql.Date, DateType) => dte.toLocalDate.toEpochDay.toInt
    case (r: Row, st: StructType) => toRecord(r, st, fieldSchema)
    case (s: Seq[_], ArrayType(et, _)) =>
      val elemSchema = nonNull(fieldSchema.getElementType)
      s.map(toAvroValue(_, elemSchema, et)).asJava
    case (other, _) => other
  }

  private def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      rec.put(f.name, toAvroValue(row.get(i), nonNull(schema.getField(f.name).schema()), f.dataType))
      i += 1
    }
    rec
  }

  // ------------------------------------------------------------------ decode

  /** Decode a Kafka-shaped frame's binary `value` into typed columns under
    * `rowSchema` — the Avro twin of [[KafkaCdc.decode]]. Null values (Kafka
    * tombstones) decode to all-null rows, matching `from_json(null)`.
    */
  def decode(frame: DataFrame, rowSchema: StructType,
             registryFraming: Boolean = false): DataFrame = {
    val schemaJson = avroSchemaJson(rowSchema, "cdc_value")
    val stripped =
      if (registryFraming) expr(s"substring(value, ${RegistryHeaderLen + 1}, 2147483647)")
      else col("value")
    val values = frame.select(stripped.cast("binary").as("value"))
    if (sparkAvroPresent)
      values.select(nativeAvroFn("from_avro", col("value"), schemaJson).as("r")).select("r.*")
    else {
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(rowSchema)
      val nFields = rowSchema.fields.length
      values.mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var decoder: BinaryDecoder = null
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](0)
          if (bytes == null) Row.fromSeq(Seq.fill[Any](nFields)(null))
          else {
            decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
            toRow(reader.read(null, decoder), rowSchema)
          }
        }
      }
    }
  }

  /** Registry-aware decode: the per-row schema id in the Confluent frame is
    * resolved to its WRITER schema through the [[SchemaRegistryClient]] seam
    * and Avro schema resolution reads it under the pipeline's READER schema
    * (`rowSchema`) — so frames written under an evolved schema (added
    * defaulted fields, reordered fields) decode correctly instead of
    * assuming every frame was written under the reader's schema the way
    * [[decode]]'s fixed-framing mode does. This always runs the datum-reader
    * path: per-row writer schemas are exactly what the native `from_avro`
    * expression cannot express (one schema per COLUMN) — the same reason
    * Confluent's own deserializer lives outside it. Readers are cached per
    * (partition, schema id), so a connected HTTP client sees lookups
    * proportional to distinct schema count, not rows.
    */
  def decodeRegistered(frame: DataFrame, rowSchema: StructType,
                       registry: SchemaRegistryClient): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(rowSchema)
    val nFields = rowSchema.fields.length
    frame.select(col("value").cast("binary").as("value")).mapPartitions { it =>
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var decoder: BinaryDecoder = null
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        if (bytes == null) Row.fromSeq(Seq.fill[Any](nFields)(null))
        else {
          require(bytes.length > RegistryHeaderLen && bytes(0) == 0,
            s"not a registry-framed Avro value (${bytes.length} bytes)")
          val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
            ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
          val reader = readers.getOrElseUpdate(id, {
            val writerSchema = new Schema.Parser().parse(registry.schemaById(id))
            // Avro resolution demands matching record names, so the reader
            // schema is derived PER writer id under the writer's own record
            // name (all graft writers share the graft.cdc namespace)
            val readerSchema = new Schema.Parser().parse(
              avroSchemaJson(rowSchema, writerSchema.getName))
            new GenericDatumReader[GenericRecord](writerSchema, readerSchema)
          })
          decoder = DecoderFactory.get().binaryDecoder(bytes, RegistryHeaderLen,
            bytes.length - RegistryHeaderLen, decoder)
          toRow(reader.read(null, decoder), rowSchema)
        }
      }
    }
  }

  // ------------------------------------------------------------------ encode

  /** Project a result into the Kafka sink frame with an Avro-encoded value —
    * the Avro twin of [[graft.sinks.KafkaFrames.toKafkaFrame]]: (key, value,
    * topic) with binary key/value, value framed for the registry when
    * `registryFraming` (the reference's serde always frames).
    */
  /** [[sinkFrame]] with the schema id obtained by REGISTERING the payload's
    * derived Avro schema under `subject` through the [[SchemaRegistryClient]]
    * seam — the producer half of the registry protocol (the reference serde
    * auto-registers on first produce), replacing the fixed-id stand-in.
    * Registration happens once at plan build (driver side), not per row.
    */
  def sinkFrameRegistered(df: DataFrame, keyCols: Seq[String], topic: String,
                          subject: String, registry: SchemaRegistryClient): DataFrame = {
    val id = registry.register(subject, avroSchemaJson(df.schema, "sink_value"))
    sinkFrame(df, keyCols, topic, registryFraming = true, schemaId = id)
  }

  def sinkFrame(df: DataFrame, keyCols: Seq[String], topic: String,
                registryFraming: Boolean = true, schemaId: Int = 1): DataFrame = {
    val payloadSchema = df.schema
    val schemaJson = avroSchemaJson(payloadSchema, "sink_value")
    if (sparkAvroPresent) {
      val avro = nativeAvroFn("to_avro", struct(df.columns.map(col).toSeq: _*), schemaJson)
      val value = if (registryFraming) concat(lit(registryHeader(schemaId)), avro) else avro
      df.select(
        concat_ws("_", keyCols.map(col): _*).cast("binary").as("key"),
        value.as("value"), lit(topic).as("topic"))
    } else {
      val in = df.select(concat_ws("_", keyCols.map(col): _*).as("k"),
        struct(df.columns.map(col).toSeq: _*).as("p"))
      val outSchema = StructType(Seq(
        StructField("key", BinaryType), StructField("value", BinaryType),
        StructField("topic", StringType, nullable = false)))
      implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
      val hdr = registryHeader(schemaId)
      in.mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val baos = new ByteArrayOutputStream()
        var encoder: BinaryEncoder = null
        it.map { r =>
          baos.reset()
          encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
          writer.write(toRecord(r.getStruct(1), payloadSchema, schema), encoder)
          encoder.flush()
          val payload = baos.toByteArray
          Row(r.getString(0).getBytes(StandardCharsets.UTF_8),
            if (registryFraming) hdr ++ payload else payload, topic)
        }
      }
    }
  }
}
