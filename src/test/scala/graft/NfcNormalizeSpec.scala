package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalizeExpression
import graft.functions.NfcNormalizeExpression.nfcNormalize
import graft.queries.TextQueries

/** NFC canonicalization: the codegen'd expression must agree with the JDK
  * reference on every input class (ASCII, combining marks, Hangul jamo,
  * astral), be idempotent, pass already-normal input through, and the
  * `q_nfc_canon` fixture must exercise real canonical merging.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def jdkNfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  test("precomposed and decomposed forms meet at the same NFC string") {
    val pre = "café"      // é precomposed
    val dec = "café"     // e + combining acute
    assert(pre != dec) // byte-distinct inputs...
    val got = Seq(pre, dec).toDF("s")
      .select(nfcNormalize(col("s")).as("n")).as[String].collect()
    assert(got(0) == got(1) && got(0) == pre) // ...one canonical output
    // Hangul: conjoining jamo compose to the precomposed syllable
    val jamo = "한" // ᄒ + ᅡ + ᆫ -> 한
    val han = Seq(jamo).toDF("s")
      .select(nfcNormalize(col("s")).as("n")).as[String].collect()(0)
    assert(han == "한" && han == jdkNfc(jamo))
  }

  test("expression agrees with the JDK reference on random mixed-plane strings") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // draw from the seams: ASCII, Latin-1, combining marks, jamo, CJK, astral
    val unit = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"), Gen.const("e"),
      Gen.const("́"), Gen.const("̈"), Gen.const("ᄒ"),
      Gen.const("ᅡ"), Gen.const("ᆫ"), Gen.const("中"),
      Gen.const("😀") /* astral emoji */, Gen.const(" "))
    val str = Gen.listOf(unit).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(32, str)) { ss =>
      val got = ss.toDF("s")
        .select(nfcNormalize(col("s")).as("n")).as[String].collect().toSeq
      val idem = got.map(jdkNfc)
      got == ss.map(jdkNfc) && idem == got // reference agreement + idempotence
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"NFC diverged from the JDK reference: ${res.status}")
  }

  test("null and already-normal inputs pass through") {
    val out = Seq(Some("plain ascii"), None).toDF("s")
      .select(nfcNormalize(col("s")).as("n")).as[Option[String]].collect()
    assert(out(0).contains("plain ascii") && out(1).isEmpty)
    // interpreted path (no codegen) matches
    val e = NfcNormalizeExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("café")))
    assert(e.eval(null).toString == "café")
  }

  test("q_nfc_canon plants byte-distinct, canonically-equal probes") {
    // the fixture constants themselves: NFC-equal, byte-distinct
    assert(TextQueries.NfcProbePre != TextQueries.NfcProbeDec)
    assert(jdkNfc(TextQueries.NfcProbeDec) == TextQueries.NfcProbePre)
    val r = TextQueries.nfcCanon(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()(0)
    val (nDocs, nDenormal, rawD, nfcD) = r
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(nDocs == docs.count())
    // exactly the decomposed-suffix class is non-normal (corpus is ASCII)
    val class1 = docs.filter(pmod(col("doc_id"), lit(3L)) === 1L).count()
    assert(nDenormal == class1)
    assert(nfcD <= rawD && nfcD > 0)
  }
}
