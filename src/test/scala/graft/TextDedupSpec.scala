package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{FingerprintExpression, TextFunctions}
import graft.operators.TextDedup

/** Unit + property coverage for the dedup/fingerprint/text-analysis family.
  * The DuckDB oracle covers the registered queries end-to-end; these tests pin
  * the edge cases the oracle data doesn't exercise (short docs, exact dups,
  * merge associativity, known hash values).
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** The composed cleaning pipeline on a hand-built corpus: every gate and
    * both dedup stages must fire — verbatim copy removed by the canonical
    * min-id rule, near-dup removed greedily as the higher id of its verified
    * pair, German and low-quality docs removed by the gates.
    */
  test("corpusClean: gates + exact dedup + near-dup removal compose correctly") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river in the morning light with a calm and steady pace"
    val near = good.replace("morning", "evening")
    val other = "a tall ship sails to the harbor and the crew is glad to see " +
      "the shore of the island in the warm light of day"
    val german = "der hund ist nicht das problem und die katze ist auch nicht das problem"
    val junk = "zzz qqq ;;; !!! ???"
    val dir = java.nio.file.Files.createTempDirectory("clean-corpus").toString
    docsDf(1L -> good, 2L -> good, 3L -> near, 4L -> other, 5L -> german, 6L -> junk)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.corpusClean(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "quality_e4", "n_tokens"))
    val survivors = out.select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(1L, 4L),
      s"expected copy(2), near-dup(3), german(5), junk(6) removed; got $survivors")
  }

  /** Degenerate corpora must not error: an empty table flows through every
    * stage to an empty result, and an all-identical corpus collapses to one
    * survivor (canon keeps the min id; the near-dup stage then sees a single
    * doc and produces no pairs).
    */
  test("corpusClean: empty and all-identical corpora") {
    val emptyDir = java.nio.file.Files.createTempDirectory("clean-empty").toString
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$emptyDir/documents.parquet")
    assert(graft.queries.TextQueries.corpusClean(spark, emptyDir).count() === 0L)

    val sameDir = java.nio.file.Files.createTempDirectory("clean-same").toString
    val good = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river in the morning light with a calm and steady pace"
    docsDf(7L -> good, 3L -> good, 9L -> good)
      .write.mode("overwrite").parquet(s"$sameDir/documents.parquet")
    val out = graft.queries.TextQueries.corpusClean(spark, sameDir)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(3L))
  }

  test("shingles: docs shorter than n yield zero shingles, no runtime error") {
    val df = docsDf(1L -> "one two", 2L -> "a b c d", 3L -> "x")
    val sh = TextDedup.shingles(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh === Set((2L, "a b c"), (2L, "b c d")))
  }

  test("exactDedup collapses identical texts to min doc_id with copy count") {
    val df = docsDf(5L -> "same text", 2L -> "same text", 9L -> "other")
    val out = TextDedup.exactDedup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out === Set((2L, 2L), (9L, 1L)))
  }

  test("jaccardPairs finds near-dups and is symmetric in input order") {
    val near1 = "the quick brown fox jumps over the lazy dog today"
    val near2 = "the quick brown fox jumps over the lazy dog tonight"
    val far = "completely different words in this document here now ok fine"
    val df = docsDf(1L -> near1, 2L -> near2, 3L -> far)
    val pairs = TextDedup.jaccardPairs(df, "doc_id", "text", n = 3, thresholdPct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // permuting input rows must not change the result
    val pairs2 = TextDedup.jaccardPairs(docsDf(3L -> far, 2L -> near2, 1L -> near1),
        "doc_id", "text", n = 3, thresholdPct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs2 === pairs)
  }

  test("containmentPairs flags a subset doc that Jaccard misses, directionally") {
    val short = "the quick brown fox jumps over the lazy dog"
    val long = short + " and then it runs far away to the river where the " +
      "water is cold and the grass is tall and the morning sun is bright"
    val other = "a completely different sentence about ships and harbors and " +
      "sailors on the open sea under a grey sky full of wind"
    val d = docsDf(1L -> short, 2L -> long, 3L -> other)
    // every 3-shingle of doc 1 appears in doc 2 → containment 100%
    val cont = TextDedup.containmentPairs(d, "doc_id", "text", n = 3, thresholdPct = 100)
      .select("contained", "container").as[(Long, Long)].collect().toSet
    assert(cont === Set(1L -> 2L), "only the subset direction qualifies")
    // the same pair sits far below a 60% Jaccard dedup cut — the signal gap
    val jac = TextDedup.jaccardPairs(d, "doc_id", "text", n = 3, thresholdPct = 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains(1L -> 2L) && !jac.contains(2L -> 1L))
  }

  test("minhash LSH candidates exact-verified match the exact jaccard pairs") {
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val df = docsDf(
      1L -> base,
      2L -> (base + " extra"),                       // J ~ 28/31 vs doc 1
      3L -> (31 to 60).map(i => s"token$i").mkString(" "))
    val exact = TextDedup.jaccardPairs(df, "doc_id", "text", 3, 60)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashDedupPairs(df, "doc_id", "text", 3, 60,
        numHashes = 32, rowsPerBand = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact === Set((1L, 2L)))
    assert(lsh === exact)
  }

  test("simhash aggregator merge is associative and matches serial reduce") {
    val agg = TextDedup.simhashAgg
    val hashes = Seq(0x123456789abcdefL, -0x6789abcdef1234L, 0x1L, -0x1L, 77777L)
    val serial = {
      val b = hashes.foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
      agg.finish(b)
    }
    // split at every point, reduce halves independently, merge
    (1 until hashes.length).foreach { cut =>
      val (l, r) = hashes.splitAt(cut)
      val bl = l.foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
      val br = r.foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
      assert(agg.finish(agg.merge(bl, br)) === serial)
    }
  }

  test("simhashNearDupPairs: identical docs at distance 0, disjoint docs absent") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val df = docsDf(1L -> a, 2L -> a, 3L -> "uno dos tres cuatro cinco seis")
    val out = TextDedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 0L)))
  }

  test("fingerprint: deterministic known value, distinct on distinct input") {
    val expected = {
      var h = FingerprintExpression.Seed
      "abc".getBytes("UTF-8").foreach(b => h = h * FingerprintExpression.Prime + b)
      h
    }
    val out = docsDf(1L -> "abc", 2L -> "abd")
      .select(FingerprintExpression.fingerprint(col("text")).as("fp"))
      .as[Long].collect()
    assert(out(0) === expected)
    assert(out(0) !== out(1))
  }

  test("text functions: hand-computed stats on a known sentence") {
    val s = "the cat sat on the mat, and it is nice."
    val df = Seq(1L -> s).toDF("doc_id", "text").select(
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"),
      TextFunctions.punctCount(col("text")).cast("long").as("punct"),
      TextFunctions.markerCount(col("text"), "en").cast("long").as("en"),
      TextFunctions.langId(col("text")).as("lang"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("toks") === 10L)
    assert(r.getAs[Long]("punct") === 2L)  // comma + period
    assert(r.getAs[Long]("en") === 4L)     // the, the, and, is
    assert(r.getAs[String]("lang") === "en")
  }

  /** Canonicalization collisions: formatting variants (case, runs of spaces,
    * edge whitespace) collide; genuinely different texts do not; the n_raw
    * column separates formatting variants from byte-identical copies.
    */
  test("canonCollisions catches case/whitespace variants only") {
    val docs = Seq(
      (1L, "The Quick  Brown Fox"),
      (2L, "the quick brown fox "),   // case + spacing variant of 1
      (3L, "the quick brown fox"),    // canonical twin of 1 and 2
      (4L, "a different text"),
      (5L, "a different text"),       // byte-identical to 4
      (6L, "an unrelated document")
    ).toDF("doc_id", "text")
    val out = graft.queries.TextQueries.canonCollisionsOf(docs)
      .as[(String, Long, Long, Long)].collect()
      .map { case (_, n, nRaw, first) => (first, n, nRaw) }.toSet
    // group of 1/2/3: three copies, three raw variants (formatting dupes);
    // group of 4/5: two copies, ONE raw variant (plain exact dupes)
    assert(out === Set((1L, 3L, 3L), (4L, 2L, 1L)))
  }
}
