package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.PartitionedSink

/** The partitioned writer must produce a prunable date layout with
  * size-bounded files and unchanged data.
  */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write: layout, file sizing, lossless round-trip") {
    val day = 86400000000L
    val rows = (1 to 500).map(i => (i.toLong, (i % 3) * day + i * 1000L, s"p$i"))
    val df = rows.toDF("id", "tus", "payload")
    val out = Files.createTempDirectory("psink").toString

    PartitionedSink.writeDatePartitioned(df, out, "tus", Seq("id"),
      maxRecordsPerFile = 50L)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("dt=")) === 3, "one directory per day")

    val back = spark.read.parquet(out)
    assert(back.count() === 500)
    assert(back.select(sum("id")).as[Long].collect()(0) === rows.map(_._1).sum)

    // file sizing: 500 rows / 3 partitions at <=50 rows/file => >3 files
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.length > 3, s"expected multiple size-bounded files, got ${files.length}")

    // partition pruning: a dt filter scans only that partition's files
    val oneDay = back.filter(col("dt") === back.select(max("dt")).collect()(0).getDate(0))
    val scanned = oneDay.select(input_file_name()).distinct().count()
    assert(scanned < files.length, "dt filter must not touch every file")
  }
}
