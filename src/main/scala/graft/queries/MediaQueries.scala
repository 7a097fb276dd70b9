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

  /** Cosine threshold for media near-dup over the 5-dim stub features: the
    * harness payloads' feature cosines top out ≈0.9998, so 0.999 yields a
    * small stable pair set (5 at sf0.01, 7 at sf0.001).
    */
  val MediaNearDupThreshold = 0.999

  /** Multimodal → similarity-search composition: payloads through the batched
    * feature extractor, then the embedding near-dup operator — the cross-modal
    * dedup shape (payload → encoder → cosine blocking) with the stub encoder
    * in the encoder seat. All-pairs here is the oracle baseline form; the
    * bucketed [[graft.operators.Embeddings.ivfNearDupPairsWith]] takes the
    * same feature frame at scale.
    */
  def mediaNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Embeddings.cosineNearDupPairs(
      Multimodal.extractFeatures(payloads(spark, dir), "doc_id", "payload").toDF()
        .select(col("doc_id").as("vec_id"), col("embedding")),
      MediaNearDupThreshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (mediaMeta _),
    "q_media_frames" -> (mediaFrames _),
    "q_media_neardup" -> (mediaNearDup _))

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
         FROM documents, unnest([0, 1, 2]) AS u(i)""",
    // stub features recomputed from md5 hex: 24-bit ints / 2^24 are exact in
    // float32 and double, and the dot/norm arithmetic below evaluates in the
    // same left-to-right double sequence as the Spark DotProduct expression
    "q_media_neardup" ->
      s"""WITH f AS (
            SELECT doc_id,
              CAST('0x' || substring(md5(text), 1, 6) AS INT)::DOUBLE / 16777216.0 AS a1,
              CAST('0x' || substring(md5(text), 7, 6) AS INT)::DOUBLE / 16777216.0 AS a2,
              CAST('0x' || substring(md5(text), 13, 6) AS INT)::DOUBLE / 16777216.0 AS a3,
              CAST('0x' || substring(md5(text), 19, 6) AS INT)::DOUBLE / 16777216.0 AS a4,
              CAST('0x' || substring(md5(text), 25, 6) AS INT)::DOUBLE / 16777216.0 AS a5
            FROM documents
          ), n AS (
            SELECT doc_id, a1, a2, a3, a4, a5,
                   sqrt(a1*a1 + a2*a2 + a3*a3 + a4*a4 + a5*a5) AS nm
            FROM f)
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM n x JOIN n y ON x.doc_id < y.doc_id
          WHERE (x.a1*y.a1 + x.a2*y.a2 + x.a3*y.a3 + x.a4*y.a4 + x.a5*y.a5)
                  / (x.nm * y.nm) >= $MediaNearDupThreshold""")
}
