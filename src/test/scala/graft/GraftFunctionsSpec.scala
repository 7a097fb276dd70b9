package graft

import org.apache.spark.sql.graft.GraftFunctions
import graft.functions.FingerprintExpression

/** SQL-surface registration: the native expressions must be callable from
  * spark.sql with values identical to the Column API.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)

    val fp = spark.sql("SELECT fingerprint('abc') AS fp").as[Long].collect()(0)
    val expected = {
      var h = FingerprintExpression.Seed
      "abc".getBytes("UTF-8").foreach(b => h = h * FingerprintExpression.Prime + b)
      h
    }
    assert(fp === expected)

    val sh = spark.sql("SELECT shingles('a b c d', 3) AS s")
      .as[Seq[String]].collect()(0)
    assert(sh === Seq("a b c", "b c d"))

    val dot = spark.sql(
      """SELECT dot_product_f(CAST(array(1.0, 2.0) AS array<float>),
                              CAST(array(3.0, 4.0) AS array<float>)) AS d""")
      .as[Double].collect()(0)
    assert(dot === 11.0)

    // decomposed e + U+0301 composes to the precomposed form (normal
    // single-quoted Scala strings DO process \uXXXX escapes — only
    // triple-quoted ones are inert, see TextQueries.NfcProbeDec)
    val nfc = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS n").as[String].collect()(0)
    assert(nfc == "caf\u00e9")

    val mhSql = spark.sql(
      "SELECT minhash_sig(shingles('a b c d e', 3), 4).sig AS m")
      .as[Seq[Long]].collect()(0)
    val mhCol = spark.range(1)
      .select(graft.functions.MinHashSigExpression.minhashSig(
        graft.functions.ShinglesExpression.shingles(
          org.apache.spark.sql.functions.lit("a b c d e"), 3), 4).getField("sig").as("m"))
      .as[Seq[Long]].collect()(0)
    assert(mhSql.length === 4 && mhSql === mhCol)

    // hilbert_index: the four corners of a 2-bit grid follow the scaled
    // order-1 U shape (0 \u2192 5 \u2192 10 \u2192 15 along the curve)
    val h = spark.sql(
      """SELECT hilbert_index(0, 0, 2) AS a, hilbert_index(0, 3, 2) AS b,
                hilbert_index(3, 3, 2) AS c, hilbert_index(3, 0, 2) AS d""")
      .selectExpr("CAST(a AS LONG)", "CAST(b AS LONG)", "CAST(c AS LONG)", "CAST(d AS LONG)")
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(h === ((0L, 5L, 10L, 15L)))
  }

  /** The SQL-only user path end-to-end: harness tables as views + injected
    * native functions = a dedup query in pure SQL, no Column API anywhere.
    */
  test("pure SQL over registered views reaches the engine surface") {
    GraftFunctions.register(spark)
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    try {
      val dup = spark.sql(
        """SELECT count(*) AS n_docs, count(DISTINCT fingerprint(text)) AS n_distinct
           FROM documents""").as[(Long, Long)].collect()(0)
      assert(dup._1 > 0 && dup._2 > 0 && dup._2 <= dup._1)
      val sh = spark.sql(
        """SELECT count(*) AS n FROM (
             SELECT explode(shingles(text, 3)) AS s FROM documents)""")
        .as[Long].collect()(0)
      assert(sh > 0)
    } finally {
      // the SparkSession is shared across the serial suites — don't leak
      // harness-named views into later tests
      graft.sources.Tables.names.foreach(spark.catalog.dropTempView)
    }
  }

  test("shingles rejects a non-literal n") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingles('a b', length('xx'))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  /** srp_pack's ±1 matrix and accumulation must equal a sequential-double
    * reference built from the shared Carter-Wegman parity — the contract
    * that keeps the packed bits bit-identical to the DuckDB replay (±1
    * products are exact, sums sequential). Exercised on harness embeddings.
    */
  test("srp_pack bits equal the sequential Carter-Wegman reference") {
    import org.apache.spark.sql.functions.col
    val rows = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64)
      .select(col("vec_id"),
        graft.functions.SrpPackExpression.srpPack(col("embedding")).as("pk"),
        col("embedding"))
      .select(col("vec_id"), col("pk.sig_lo"), col("pk.sig_hi"), col("embedding"))
      .as[(Long, Long, Long, Array[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, lo, hi, e) =>
      var rLo = 0L
      var rHi = 0L
      for (j <- 0 until 64) {
        var s = 0.0
        for (i <- e.indices.take(64)) {
          val x = j.toLong * 64 + i
          val sign = if (((1103515245L * x + 12345L) % 2147483647L) % 2 == 0L) 1.0 else -1.0
          s += e(i).toDouble * sign
        }
        if (s > 0) { if (j < 32) rLo |= 1L << j else rHi |= 1L << (j - 32) }
      }
      assert((lo, hi) === ((rLo, rHi)), s"vec $id bits drifted")
    }

    // family coupling, through PUBLIC surfaces: the packed halves must
    // decompose into exactly srpSignatures' 4-bit bands (same planes, same
    // signs) — if Embeddings.srpPlane's constants ever moved, this breaks
    // even though the gate and the sequential reference above stay green
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64)
    val packed = rows.map { case (id, lo, hi, _) => id -> ((lo, hi)) }.toMap
    graft.operators.Embeddings.srpSignatures(vecs, nBits = 64)
      .as[(Long, Int, Long)].collect()
      .foreach { case (id, band, sig) =>
        val (lo, hi) = packed(id)
        val expect =
          if (band < 8) (lo >>> (band * 4)) & 15L
          else (hi >>> (band * 4 - 32)) & 15L
        assert(sig === expect, s"vec $id band $band: srp_pack and srpSignatures disagree")
      }
  }
}
