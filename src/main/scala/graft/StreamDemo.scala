package graft

import org.apache.spark.sql.SparkSession
import graft.sources.FileEventSource
import graft.streaming.{EventGenerator, SinkConfig, StreamApp, WindowConfig}

/** End-to-end demo — the `make demo` analog (Makefile:181-190 in the
  * reference): generate event files from testdata, replay them through
  * the streaming pipeline (4 queries), drain, and report sink row
  * counts. Usage: runMain graft.StreamDemo [sfDir] [outRoot]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-demo").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    EventGenerator.writeAll(spark, sfDir, s"$outRoot/events", slices = 4)

    val queries = StreamApp.run(spark,
      FileEventSource(s"$outRoot/events/orders"),
      FileEventSource(s"$outRoot/events/items"),
      FileEventSource(s"$outRoot/events/payments"),
      s"$outRoot/metrics",
      WindowConfig(watermark = Some("10 minutes")),
      SinkConfig(triggerInterval = "2 seconds",
        checkpointRoot = s"$outRoot/checkpoints"))
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())

    Seq("real_time_funnel", "gmv_metrics", "drop_off_analysis", "payment_metrics")
      .foreach { t =>
        val n = try spark.read.parquet(s"$outRoot/metrics/$t").count()
          catch { case _: Throwable => 0L }
        println(s"[demo] $t rows=$n")
      }
    println(s"[demo] output at $outRoot")
    spark.stop()
  }
}
