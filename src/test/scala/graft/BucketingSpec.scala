package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sinks.Bucketing

/** Bucketed co-located joins: after paying the layout shuffle once at write
  * time, the fact-to-fact join must plan with ZERO shuffle exchanges and
  * produce exactly the rows of the shuffled join over the raw tables.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // deliberately NOT SparkSpec.collectPlan: exchange-counting must walk the
  // FINAL adaptive plan (a.executedPlan), not the pre-AQE input plan
  private def collectExecutedPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: collectExecutedPlan(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectExecutedPlan)
  }

  test("bucketed lineitem ⋈ orders plans with zero exchanges, same result") {
    val tmp = Files.createTempDirectory("buckets").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_b", s"$tmp/li", buckets = 4,
      keys = Seq("l_orderkey"), sortKeys = Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_b", s"$tmp/ord", buckets = 4,
      keys = Seq("l_orderkey"), sortKeys = Seq("l_orderkey"))
    val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(broadcastKey)
    spark.conf.set(broadcastKey, "-1") // force SMJ so the exchange check bites
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_b", "ord_b", Seq("l_orderkey"))
      joined.write.format("noop").mode("overwrite").save() // finalize AQE plan
      val exchanges = collectExecutedPlan(joined.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles: ${exchanges.map(_.nodeName)}")

      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() === expected)
      assert(expected > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(broadcastKey, v)
        case None => spark.conf.unset(broadcastKey)
      }
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("a raw-path read of the same files loses the contract and re-shuffles") {
    val tmp = Files.createTempDirectory("buckets2").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_b2", s"$tmp/li", buckets = 4,
      keys = Seq("l_orderkey"))
    val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(broadcastKey)
    spark.conf.set(broadcastKey, "-1")
    try {
      // same bytes, read WITHOUT the catalog: bucketing metadata is gone
      val raw = spark.read.parquet(s"$tmp/li")
      val joined = raw.join(spark.table("li_b2").withColumnRenamed("l_quantity", "q2"),
        "l_orderkey")
      joined.write.format("noop").mode("overwrite").save()
      val exchanges = collectExecutedPlan(joined.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "expected the raw-path side to require a shuffle")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(broadcastKey, v)
        case None => spark.conf.unset(broadcastKey)
      }
      spark.sql("DROP TABLE IF EXISTS li_b2")
    }
  }

  /** The ANN serving index as a bucketed layout: the per-query candidate join
    * `cands ⋈ codes ON neighbor_id` ([[Embeddings.ivfPqTopKFromIndex]]) is
    * the one serving-time join that touches the INDEX-SIZED side — bucketing
    * the codes table by neighbor_id at index-build time removes that side's
    * shuffle from every probe (the small probed-candidate side still
    * repartitions to match the bucket count; at 100 TB the asymmetry is the
    * whole point). Results must be identical to the raw-parquet path.
    */
  test("a bucketed codes index serves IVF-PQ top-k without shuffling the index side") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Embeddings
    import spark.implicits._
    val tmp = Files.createTempDirectory("annbuckets").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = corpus.filter(col("vec_id") < 16)
    val cb = Embeddings.pqCodebook(corpus)
    val codes = Embeddings.pqEncode(corpus, cb)
      .select(col("vec_id").as("neighbor_id"), col("m"), col("code"))
    val assigned = Embeddings.ivfAssign(corpus, centroids)
      .select(col("vec_id").as("neighbor_id"), col("cent_id"))
    // materialize both layouts of the SAME index rows
    codes.write.mode("overwrite").parquet(s"$tmp/codes_raw")
    Bucketing.writeBucketed(codes, "codes_b", s"$tmp/codes_b", buckets = 4,
      keys = Seq("neighbor_id"), sortKeys = Seq("neighbor_id"))
    val queries = corpus.filter(col("vec_id") < 4)
    val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(broadcastKey)
    spark.conf.set(broadcastKey, "-1") // SMJ everywhere a hint doesn't force BHJ
    try {
      def serve(codesDf: org.apache.spark.sql.DataFrame): (Int, Set[(Long, Long, Int)]) = {
        val res = Embeddings.ivfPqTopKFromIndex(codesDf, assigned, queries,
          centroids, cb, nProbe = 4, k = 5)
        res.write.format("noop").mode("overwrite").save()
        val ex = collectExecutedPlan(res.queryExecution.executedPlan)
          .collect { case e: ShuffleExchangeExec => e }
        (ex.size, res.as[(Long, Long, Int)].collect().toSet)
      }
      val (rawEx, rawRes) = serve(spark.read.parquet(s"$tmp/codes_raw"))
      val (bEx, bRes) = serve(spark.table("codes_b"))
      assert(bRes === rawRes, "bucketed serving changed the results")
      assert(rawRes.nonEmpty)
      assert(bEx < rawEx,
        s"bucketed codes side still shuffles: $bEx exchanges vs raw $rawEx")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(broadcastKey, v)
        case None => spark.conf.unset(broadcastKey)
      }
      spark.sql("DROP TABLE IF EXISTS codes_b")
    }
  }
}
