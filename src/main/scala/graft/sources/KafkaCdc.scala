package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source-side adapters (SURVEY.md §2 #1 Kafka source, #16 CDC normalization).
  *
  * The reference consumes three Debezium-CDC topics with Avro + schema
  * registry serdes (reference: TokenBalance.java:92-114, Schemas.java:27-136,
  * README.md:22-56). This sandbox has no broker or registry, so the adapter
  * splits into:
  *
  *   - [[reader]]: the `readStream` wiring for a connected deployment
  *     (needs the spark-sql-kafka package on the classpath);
  *   - [[decode]] / [[decodeAvro]]: the value→columns chain — JSON and
  *     registry-framed Avro serdes with the same call shape, both
  *     batch-testable on a raw (key, value) frame. The Avro path probes the
  *     classpath: native `from_avro` with spark-avro present, executable
  *     avro-core fallback without ([[AvroSerde]]);
  *   - [[unwrapDebezium]]: the envelope-normalization stage the reference
  *     gets from Connect SMTs (`ExtractNewRecordState`-style flattening,
  *     evidenced by `__deleted` in every value schema). Given raw envelopes
  *     `{before, after, op}`, emits the flat row image plus `__deleted`
  *     ("true" for op=d, "false" otherwise) — deletes carry `before`, all
  *     other ops carry `after`, matching Debezium's record shape.
  */
object KafkaCdc {

  /** Streaming Kafka reader for a connected deployment. */
  def reader(spark: SparkSession, brokers: String, topic: String,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Decode a Kafka-shaped frame's binary/string `value` into typed columns.
    * The serde boundary of the pipeline: JSON here, Avro via [[decodeAvro]] —
    * same call shape, interchangeable per topic.
    */
  def decode(frame: DataFrame, schema: StructType): DataFrame =
    frame
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select("r.*")

  /** Avro serde variant of [[decode]] — the reference's actual wire format
    * (registry-framed Avro, Schemas.java:89-136). Dispatches to the native
    * `from_avro` expression when the spark-avro module is on the classpath,
    * else to the executable avro-core fallback; see [[AvroSerde]].
    */
  def decodeAvro(frame: DataFrame, schema: StructType,
                 registryFraming: Boolean = true): DataFrame =
    AvroSerde.decode(frame, schema, registryFraming)

  /** Debezium envelope schema for a given row schema. */
  def envelopeSchema(rowSchema: StructType): StructType =
    new StructType()
      .add("before", rowSchema, nullable = true)
      .add("after", rowSchema, nullable = true)
      .add("op", org.apache.spark.sql.types.StringType, nullable = true)

  /** Normalize raw Debezium envelopes into flat rows + `__deleted`.
    * Input must carry `before`/`after` struct columns and `op`; output columns
    * are the row schema's fields (minus any `__deleted` it already carries)
    * with `__deleted` appended — i.e. the shape the rest of the pipeline and
    * the reference's Avro value schemas expect.
    */
  def unwrapDebezium(envelopes: DataFrame, rowSchema: StructType): DataFrame = {
    val image = when(col("op") === "d", col("before")).otherwise(col("after"))
    val fields = rowSchema.fieldNames.filterNot(_ == "__deleted")
    envelopes
      .withColumn("_img", image)
      .filter(col("_img").isNotNull)
      .select(fields.map(f => col(s"_img.$f")) :+
        when(col("op") === "d", "true").otherwise("false").as("__deleted"): _*)
  }

  /** Full source chain for one CDC topic in a connected deployment:
    * read → decode envelope (`serde` = "json" | "avro") → normalize. In the
    * sandbox the same chain runs from a MemoryStream/batch frame (see the
    * spec); "avro" matches the reference's registry-framed wire format.
    */
  def cdcStream(spark: SparkSession, brokers: String, topic: String,
                rowSchema: StructType, serde: String = "avro"): DataFrame = {
    val raw = reader(spark, brokers, topic)
    val env = envelopeSchema(rowSchema)
    val decoded = serde match {
      case "json" => decode(raw, env)
      case "avro" => decodeAvro(raw, env)
      case other => throw new IllegalArgumentException(s"unknown serde: $other")
    }
    unwrapDebezium(decoded, rowSchema)
  }
}
