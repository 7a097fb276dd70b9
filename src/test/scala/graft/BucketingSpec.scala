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

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: collectPlan(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectPlan)
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
      val exchanges = collectPlan(joined.queryExecution.executedPlan)
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
      val exchanges = collectPlan(joined.queryExecution.executedPlan)
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
}
