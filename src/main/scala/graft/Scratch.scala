package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-attribution harness for the r17 optimization round —
  * NOT part of the driver contract; times named sub-pipelines of hot
  * queries with the noop sink (guide §1.4) so CPU can be attributed to
  * stages. Usage: runMain graft.Scratch <sfDir> <case> */
object Scratch {
  def procCpu(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Per-Spark-stage metrics listener: accumulates (stage name → cpu,
    * runtime, tasks) while a timed region runs. */
  class StageMetrics extends org.apache.spark.scheduler.SparkListener {
    case class M(var cpuSec: Double = 0, var runSec: Double = 0, var tasks: Int = 0,
      var shuffleReadMB: Double = 0, var shuffleWriteMB: Double = 0, var rows: Long = 0)
    val byStage = scala.collection.mutable.LinkedHashMap.empty[String, M]
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct.mkString("|")
      val site = si.details.linesIterator
        .find(l => l.contains("graft") && !l.contains("Scratch"))
        .getOrElse("").trim.take(70)
      val key = f"s${si.stageId}%-5d $site ${scopes.take(70)}"
      val m = byStage.getOrElseUpdate(key, M())
      val tm = si.taskMetrics
      m.cpuSec += tm.executorCpuTime / 1e9
      m.runSec += tm.executorRunTime / 1e3
      m.tasks += si.numTasks
      m.shuffleReadMB += tm.shuffleReadMetrics.totalBytesRead / 1e6
      m.shuffleWriteMB += tm.shuffleWriteMetrics.bytesWritten / 1e6
      m.rows += tm.outputMetrics.recordsWritten
    }
    def report(top: Int = 14): Unit = {
      val s = byStage.toSeq.sortBy(-_._2.cpuSec).take(top)
      s.foreach { case (k, m) =>
        println(f"    ${m.cpuSec}%7.2f cpu ${m.runSec}%7.2f run ${m.tasks}%5d tasks " +
          f"shR=${m.shuffleReadMB}%8.1fMB shW=${m.shuffleWriteMB}%8.1fMB  $k")
      }
    }
  }

  def time(spark: SparkSession, name: String, df: => DataFrame, runs: Int = 2): Unit = {
    val times = (1 to runs).map { i =>
      val lst = if (i == runs) Some(new StageMetrics) else None
      lst.foreach(spark.sparkContext.addSparkListener)
      def gcMs(): Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
          .map(_.getCollectionTime).sum
      }
      val g0 = gcMs()
      val c0 = procCpu(); val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(name)
      df.write.format("noop").mode("overwrite").save()
      val r = ((System.nanoTime() - t0) / 1e9, procCpu() - c0)
      if (sys.env.contains("SCRATCH_STAGES"))
        println(f"    [run $i] wall=${r._1}%6.2f cpu=${r._2}%6.1f gcWall=${(gcMs() - g0) / 1e3}%6.2f")
      lst.foreach { l =>
        Thread.sleep(500) // let the listener bus drain
        spark.sparkContext.removeSparkListener(l)
        if (sys.env.contains("SCRATCH_STAGES")) { println(s"  [last-run stages] $name"); l.report() }
      }
      r
    }
    val (w, c) = times.minBy(_._1)
    println(f"STAGE $name%-40s wall=$w%7.2f cpu=$c%7.1f")
  }

  def clear(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).count() catch { case _: Throwable => }
    }
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() catch { case _: Throwable => }

    which match {
      case "q105" => ScratchCases.q105(spark, sfDir)
      case "q159" => ScratchCases.q159(spark, sfDir)
      case "q148" => ScratchCases.q148(spark, sfDir)
      case "q176" => ScratchCases.q176(spark, sfDir)
      case "q150" => ScratchCases.q150(spark, sfDir)
      case name =>
        // fall back: time a full declared query, 3 runs like Bench
        time(spark, name, SparkEntry.queries(name)(spark, sfDir), runs = 3)
    }
    spark.stop()
  }
}
