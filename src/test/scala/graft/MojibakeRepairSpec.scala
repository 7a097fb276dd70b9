package graft

import org.apache.spark.sql.functions._
import graft.functions.MojibakeRepairExpression
import graft.functions.MojibakeRepairExpression.mojibakeRepair

/** Mojibake repair: one layer of UTF-8-read-as-Latin-1 corruption is
  * inverted, everything else — ASCII, correctly decoded non-ASCII, true
  * binary garbage — passes through byte-identically.
  */
class MojibakeRepairSpec extends SparkSpec {
  import spark.implicits._

  /** The corruption under test: UTF-8 bytes re-read as Latin-1. */
  private def corrupt(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  test("inverts one corruption layer and passes clean text through") {
    val clean = "résumé naïve ñ"
    val cases = Seq(
      corrupt(clean) -> clean,       // the repair case
      clean -> clean,                // lone E9/EF/F1 bytes: invalid UTF-8 -> passthrough
      "plain ascii" -> "plain ascii", // ASCII round-trips on the fast path
      "中文 😀" -> "中文 😀", // >U+00FF: already decoded
      "éÿ" -> "éÿ") // Latin-1 but invalid as UTF-8 bytes
    val got = cases.map(_._1).toDF("s")
      .select(mojibakeRepair(col("s")).as("r")).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      s"repair diverged: got $got, want ${cases.map(_._2)}")
  }

  test("repair(corrupt(x)) == x for arbitrary valid strings") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val unit = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"),
      Gen.const("ü"), Gen.const("ñ"), Gen.const("中"),
      Gen.const("😀"), Gen.const(" "), Gen.const("́"))
    val str = Gen.listOf(unit).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(32, str)) { ss =>
      val got = ss.map(corrupt).toDF("s")
        .select(mojibakeRepair(col("s")).as("r")).as[String].collect().toSeq
      got == ss
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"round-trip broke: ${res.status}")
  }

  test("q_moji_repair's fixture exercises every probe class") {
    import graft.queries.TextQueries
    // derived corruption really is one Latin-1 layer over the clean suffix
    assert(TextQueries.MojiBadSuffix == corrupt(TextQueries.MojiCleanSuffix))
    assert(TextQueries.MojiBadSuffix != TextQueries.MojiCleanSuffix)
    val r = TextQueries.mojiRepair(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    val (nDocs, nRepaired, nFffd, rawD, repD) = r
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(nDocs == docs.count())
    // exactly the corrupted class repairs; exactly the FFFD class flags
    assert(nRepaired == docs.filter(pmod(col("doc_id"), lit(4L)) === 1L).count())
    assert(nFffd == docs.filter(pmod(col("doc_id"), lit(4L)) === 3L).count())
    assert(repD <= rawD && repD > 0)
  }

  test("interpreted eval, SQL registration, and null agree with codegen") {
    val e = MojibakeRepairExpression(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(corrupt("café"))))
    assert(e.eval(null).toString == "café")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(s"SELECT mojibake_repair('${corrupt("café")}') AS r")
      .as[String].collect()(0)
    assert(viaSql == "café")
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(mojibakeRepair(col("s")).as("r")).as[Option[String]].collect()(0)
    assert(nul.isEmpty)
  }
}
