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
  /** Locale-independent numeric rendering for the JSON line — the f
    * interpolator uses the default locale, and a comma decimal
    * separator (de_DE, fr_FR) would emit unparseable JSON. */
  private def jnum(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f",
      java.lang.Double.valueOf(v))

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.001")
    val outRoot = if (positional.length > 1) positional(1)
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

    val shared = args.contains("--shared")
    val t0 = System.nanoTime()
    val queries = StreamApp.run(spark,
      FileEventSource(s"$outRoot/events/orders"),
      FileEventSource(s"$outRoot/events/items"),
      FileEventSource(s"$outRoot/events/payments"),
      s"$outRoot/metrics",
      WindowConfig(watermark = Some("10 minutes")),
      SinkConfig(triggerInterval = "2 seconds",
        checkpointRoot = s"$outRoot/checkpoints"),
      shared = shared)
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())
    val elapsed = (System.nanoTime() - t0) / 1e9
    val nEvents = Seq("orders", "items", "payments")
      .map(t => spark.read.text(s"$outRoot/events/$t").count()).sum
    println(f"[demo] topology=${if (shared) "shared" else "reference"} " +
      f"events=$nEvents drained in $elapsed%.1f s " +
      f"(${nEvents / elapsed}%.0f events/s)")

    val sinkRows =
      Seq("real_time_funnel", "gmv_metrics", "drop_off_analysis", "payment_metrics")
        .map { t =>
          val n = try spark.read.parquet(s"$outRoot/metrics/$t").count()
            catch { case _: Throwable => 0L }
          println(s"[demo] $t rows=$n")
          t -> n
        }
    println(s"[demo] output at $outRoot")
    // Machine-checkable throughput record (the Bench JSON-line
    // contract): one line per topology per run so the streaming claim
    // in BASELINE.md is re-measurable by grep instead of prose.
    val sinks = sinkRows.map { case (t, n) => s""""$t":$n""" }.mkString(",")
    println(s"""{"metric":"stream_demo","topology":"${
        if (shared) "shared" else "reference"
      }","events":$nEvents,"wall_sec":${jnum(elapsed, 3)},""" +
      s""""stream_events_per_sec":${jnum(nEvents / elapsed, 1)},""" +
      s""""queries":${queries.size},"sink_rows":{$sinks}}""")
    spark.stop()
  }
}
