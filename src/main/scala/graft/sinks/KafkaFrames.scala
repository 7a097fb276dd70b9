package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka sink adapter (SURVEY.md §2 #11).
  *
  * The reference produces Avro records to `nearin.oct_transfer` /
  * `nearin.oct_balance` with schema-registry serdes (reference:
  * TokenBalance.java:276,333; Schemas.java:27-122). This sandbox has no Kafka
  * broker, schema registry, or spark-avro module, so the adapter produces the
  * sink *frame* — (key, value, topic) with binary key/value — with JSON as
  * the value encoding; in a connected deployment the `to_json` call is
  * replaced by `to_avro(payload, registeredSchema)` and the writer below is
  * pointed at real brokers. The frame shape (not the serde) is what the rest
  * of the pipeline depends on, and it is batch-testable.
  *
  * Ordered output (§2 #10): the reference forces the transfer topic to ONE
  * partition for global total order (TokenBalance.java:274-275) — the
  * documented scale-safe alternative used here is per-key ordering: Kafka
  * guarantees order within a partition key, so emitting with key =
  * `affected_account` (balances) or `receipt_id` (transfers) plus the
  * ordering columns `(included_in_block_timestamp, index_in_chunk,
  * index_in_action_receipt)` in the payload lets any consumer merge to total
  * order without a 1-partition bottleneck. `.repartition(1)` remains
  * available for strict parity at toy scale.
  */
object KafkaFrames {

  /** Project a result into the Kafka sink frame (JSON value encoding). */
  def toKafkaFrame(df: DataFrame, keyCols: Seq[String], topic: String): DataFrame =
    df.select(
      concat_ws("_", keyCols.map(col): _*).cast("binary").as("key"),
      to_json(struct(df.columns.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"))

  /** Avro-valued sink frame — the reference's wire format (registry-framed
    * Avro values, Schemas.java:89-122): native `to_avro` when spark-avro is
    * on the classpath, executable avro-core fallback otherwise. Same (key,
    * value, topic) shape as [[toKafkaFrame]]; see [[graft.sources.AvroSerde]].
    */
  def toKafkaFrameAvro(df: DataFrame, keyCols: Seq[String], topic: String,
                       registryFraming: Boolean = true, schemaId: Int = 1): DataFrame =
    graft.sources.AvroSerde.sinkFrame(df, keyCols, topic, registryFraming, schemaId)

  /** Strict total-order parity mode (§2 #10): the reference forces the
    * transfer topic to ONE partition so consumers see global total order
    * (TokenBalance.java:274-275, README.md topic setup). This emits the sink
    * frame as a single partition sorted by the reference's ordering key —
    * `repartition(1)` + `sortWithinPartitions`, then the narrow (order-
    * preserving) frame projection. A deliberate scale bottleneck, exactly as
    * in the reference: use the per-key ordering documented above at scale,
    * this mode when byte-for-byte topic parity matters.
    */
  def totalOrderFrame(df: DataFrame, orderCols: Seq[String], keyCols: Seq[String],
                      topic: String): DataFrame =
    toKafkaFrame(
      df.repartition(1).sortWithinPartitions(orderCols.map(col): _*),
      keyCols, topic)

  /** Streaming writer wiring for a connected deployment (needs the
    * spark-sql-kafka package on the classpath and reachable brokers).
    */
  def writer(df: DataFrame, keyCols: Seq[String], topic: String,
             brokers: String, checkpointDir: String,
             outputMode: String = "append"): DataStreamWriter[Row] =
    toKafkaFrame(df, keyCols, topic)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
}
