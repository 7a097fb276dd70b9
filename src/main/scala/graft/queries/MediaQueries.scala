package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing exercised end-to-end over the driver's `documents`
  * table: the text column cast to binary stands in for real media payloads
  * (the testdata ships no binary table), the stub decoder's deterministic
  * arithmetic keeps both queries oracle-expressible, and the Spark side runs
  * the real partition-batched `mapPartitions` path.
  */
object MediaQueries {

  private def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(payloads(spark, dir), "doc_id", "payload").toDF()

  def mediaFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(payloads(spark, dir), "doc_id", "payload", k = 3).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (mediaMeta _),
    "q_media_frames" -> (mediaFrames _))

  val oracleSql: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
           (320 + strlen(text) % 320)::INT AS width,
           (240 + strlen(text) % 240)::INT AS height,
           'image/stub' AS media_type
         FROM documents""",
    "q_media_frames" ->
      """SELECT doc_id, i::INT AS frame_idx,
           (CASE WHEN i < 2 THEN strlen(text) // 3
                 ELSE strlen(text) - 2 * (strlen(text) // 3)
            END)::BIGINT AS frame_len
         FROM documents, unnest([0, 1, 2]) AS u(i)""")
}
