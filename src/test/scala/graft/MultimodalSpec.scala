package graft

import graft.operators.Multimodal

/** Plumbing checks for the multimodal path: payload→metadata decode shape,
  * frame fan-out arithmetic, and that a custom decoder is actually invoked
  * per row (so a real codec drops in without plumbing changes).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    (1L, "abcdefghij".getBytes("UTF-8")), // 10 bytes
    (2L, "xyz".getBytes("UTF-8")))        // 3 bytes
    .toDF("doc_id", "payload")

  test("decodeMeta: stub dims are deterministic functions of byte length") {
    val out = Multimodal.decodeMeta(payloads, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).n_bytes === 10L)
    assert(out(1L).width === 330 && out(1L).height === 250)
    assert(out(2L).n_bytes === 3L)
    assert(out(2L).width === 323 && out(2L).height === 243)
    assert(out.values.forall(_.media_type === "image/stub"))
  }

  test("sampleFrames: k frames, even split, remainder in the last frame") {
    val out = Multimodal.sampleFrames(payloads, "doc_id", "payload", k = 3)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f.frame_len).toMap
    assert(out((1L, 0)) === 3L && out((1L, 1)) === 3L && out((1L, 2)) === 4L)
    assert(out((2L, 0)) === 1L && out((2L, 1)) === 1L && out((2L, 2)) === 1L)
  }

  test("custom decoders plug into the same plumbing") {
    val fixed = new Multimodal.MediaDecoder {
      def decode(bytes: Array[Byte]): Multimodal.Decoded =
        Multimodal.Decoded(1, 2, "custom/codec")
    }
    val out = Multimodal.decodeMeta(payloads, "doc_id", "payload", fixed).collect()
    assert(out.forall(m => m.width == 1 && m.height == 2 && m.media_type == "custom/codec"))
  }

  /** Feature extraction: known MD5 ("abc" → 900150983cd24fb0d6963f7d28e17f72)
    * yields the hand-computed 24-bit-scaled features; identical payloads get
    * identical vectors; every component is an exact float in [0, 1).
    */
  test("extractFeatures: deterministic known value, exact float32 range") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload")
      .collect().map(f => f.doc_id -> f.embedding).toMap
    val expected = Seq(0x900150, 0x983cd2, 0x4fb0d6, 0x963f7d, 0x28e17f)
      .map(v => v.toFloat / 16777216.0f)
    assert(feats(1L).toSeq === expected)
    assert(feats(2L).toSeq === feats(1L).toSeq) // same payload, same vector
    assert(feats(3L).toSeq !== feats(1L).toSeq)
    assert(feats.values.forall(_.forall(x => x >= 0f && x < 1f)))
    assert(feats.values.forall(_.length === 5))
  }
}
