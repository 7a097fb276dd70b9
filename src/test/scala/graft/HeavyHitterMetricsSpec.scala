package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.HeavyHitterMetrics

/** The streaming monitor's per-source sketch must, across micro-batches,
  * honor the Misra-Gries contract against the full feed: every term above
  * n_source/(k+1) present, every emitted count a lower bound within that
  * error — the properties that make the emission a trustworthy monitor
  * signal even though it is not the exact audit.
  */
class HeavyHitterMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming per-source sketches honor the MG bounds over the whole feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 8
    val in = MemoryStream[(Long, String, String)]
    val metrics = HeavyHitterMetrics.run(
      in.toDF().toDF("doc_id", "text", "source"), "text", "source", k)
    assert(metrics.isStreaming)

    val latest = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    val q = metrics.toDF("source", "cand").writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("hh-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.as[(String, Array[(String, Long)])].collect()
        latest.synchronized {
          rows.foreach { case (s, cs) => latest(s) = cs.toMap }
        }
        ()
      }
      .start()

    def doc(s: String, words: String*) = (0L, words.mkString(" "), s)
    val feed1 = Seq(
      doc("web", Seq.fill(30)("the") ++ Seq.fill(10)("cat") ++ (1 to 25).map("w" + _): _*),
      doc("books", Seq.fill(20)("ye") ++ (1 to 15).map("b" + _): _*))
    val feed2 = Seq(
      doc("web", Seq.fill(25)("the") ++ Seq.fill(12)("spam") ++ (26 to 45).map("w" + _): _*),
      doc("books", Seq.fill(9)("ye") ++ (16 to 28).map("b" + _): _*))
    in.addData(feed1: _*)
    q.processAllAvailable()
    in.addData(feed2: _*)
    q.processAllAvailable()
    q.stop()

    val tokens = (feed1 ++ feed2).flatMap { case (_, t, s) => t.split(" ").map(s -> _) }
    val bySource = tokens.groupBy(_._1)
    val sketches = latest.synchronized(latest.toMap)
    assert(sketches.keySet === bySource.keySet)
    bySource.foreach { case (src, toks) =>
      val truth = toks.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = toks.size.toLong / (k + 1)
      val sk = sketches(src)
      val mustHave = truth.collect { case (t, c) if c > bound => t }
      assert(mustHave.forall(sk.contains),
        s"$src: heavy terms ${mustHave.filterNot(sk.contains)} missing from sketch")
      sk.foreach { case (t, c) =>
        val tc = truth.getOrElse(t, 0L)
        assert(c <= tc && tc - c <= bound, s"$src/$t: retained $c vs true $tc")
      }
      assert(sk.size <= k)
    }
    // the planted flood terms are the monitor's point: they must surface
    assert(sketches("web").contains("the") && sketches("books").contains("ye"))
  }
}
