package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (measurement only — not part of the driver contract): the Bench
  * methodology (same session confs, warm-up, min-of-3 through the noop sink)
  * over an explicit query subset, so a change can be A/B-priced on the
  * queries it touches without a 13-minute full run.
  * Usage: runMain graft.MiniBench <q1> [q2 ...]
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    args.headOption.foreach(materialize) // warm-up, unreported
    val results = args.toSeq.map { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        materialize(name)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    results.foreach { case (n, t) => println(f"[minibench] $n%-32s $t%7.3f s") }
    println(f"[minibench] TOTAL ${results.map(_._2).sum}%7.3f s over ${results.size} queries")
    spark.stop()
  }
}
