package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main — emits, in order: a per-query CPU line, a
  * per-query WALL line, and a compact total-only JSON line LAST, on
  * SPARK_GRAFT_SF_DIR (driver contract). Compact-last because the
  * driver captures the TAIL of the log: at ~100 queries the per-query
  * line outgrew the capture (BENCH_r05 `parsed:null`), printing the
  * compact line first put it in the truncated region (BENCH_r06
  * `parsed:{}`), and a combined wall+cpu line let the tail land
  * inside the cpu dict so CPU seconds read as wall (BENCH_r14) —
  * hence the separately-labeled lines. The full record is also
  * written to `target/bench.json` (every run) and to
  * `$SPARK_GRAFT_BENCH_COPY` (round-stamped committed archive) so a
  * later run can never destroy the evidence.
  *
  * A warmup pass (parquet footers + one full execution of a small
  * query) runs before timing so per-query numbers measure the query,
  * not session/classloader/codegen bootstrap.
  *
  * Env knobs: SPARK_GRAFT_ONLY (comma-separated query names) restricts
  * the sweep for local iteration; absent → full sweep.
  */
/** Shared per-query timing harness for [[Bench]] and [[SlopeBench]]. */
object BenchHarness {
  import org.apache.spark.sql.DataFrame

  /** Min of `runs` timed executions. Times full materialization:
    * xxhash64 every column of every row and fold — a count() alone
    * lets Spark prune the projection on narrow queries and
    * understates the real cost. Failures are NOT wall-timed: a query
    * that throws reports -1, never a fast-looking elapsed time.
    *
    * Between queries, drops everything the query pinned in the block
    * manager (`.cache()` inside operators, `localCheckpoint` blocks
    * from iterative ones). Without this the storage pool grows
    * monotonically across ~100 queries × runs and the LRU-eviction /
    * GC churn makes a random subset of queries 5–10× slower from
    * round to round (r3 vs r4 swings on identical code). clearCache
    * drops cached relations but NOT broadcast blocks — those are
    * reclaimed by the ContextCleaner only after a driver GC collects
    * their references, hence the System.gc() nudge (q89 measured
    * 5.1 s in a full sweep vs 1.0 s isolated without it). */
  def minOfRuns(spark: SparkSession,
      fn: (SparkSession, String) => DataFrame,
      sfDir: String, runs: Int): Double =
    minOfRunsCpu(spark, fn, sfDir, runs)._1

  /** As [[minOfRuns]], but also returns this JVM's CPU-clock delta for
    * the winning (min-wall) run — a steal-throttled outlier then
    * self-diagnoses in the bench JSON: wall far above cpu/ncpu with a
    * LOW cpu says the host, not the query, owned the window
    * (round-11 verdict #3). */
  def minOfRunsCpu(spark: SparkSession,
      fn: (SparkSession, String) => DataFrame,
      sfDir: String, runs: Int): (Double, Double) = {
    def procCpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def once(): (Double, Double) = {
      val c0 = procCpu()
      val t0 = System.nanoTime()
      val ok =
        try {
          val d = fn(spark, sfDir)
          d.select(xxhash64(d.columns.toIndexedSeq.map(col): _*).as("h"))
            .agg(expr("bit_xor(h)")).collect()
          true
        } catch { case _: Throwable => false }
      if (ok) ((System.nanoTime() - t0) / 1e9, procCpu() - c0) else (-1.0, -1.0)
    }
    val times = Seq.fill(runs)(once())
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
    val good = times.filter(_._1 >= 0)
    if (good.isEmpty) (-1.0, -1.0) else good.minBy(_._1)
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table (footer + first row group) and push one
    // query through the whole pipeline (codegen, shuffle service).
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => }
    }
    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => }

    // Load evidence: min-of-3 defends against a transient pause, not
    // against sustained external load across the whole sweep (the r8
    // driver run reported one query at 30× its isolated time under a
    // concurrent JVM — undetectable from the timings alone). Record
    // the machine's 1-min load average and this JVM's own CPU clock
    // around the sweep so a contaminated run is self-diagnosing:
    // trust the numbers when load1 ≈ proc_cpu_sec / wall_sec (this
    // process is the load); discount them when load1 is far above it
    // (someone else was burning the cores).
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def procCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    val load1Before = load1()
    val cpuBefore = procCpuSec()
    val wallStart = System.nanoTime()

    // min of three timed runs per query: run 1 is cold (codegen
    // compile, no broadcast reuse); runs 2–3 are warm, so a single
    // GC/compilation pause cannot inflate the reported number.
    //
    // Between queries, drop everything the query pinned in the block
    // manager (`.cache()` inside operators, `localCheckpoint` blocks
    // from iterative ones). Without this the storage pool grows
    // monotonically across ~100 queries × 3 runs and the LRU-eviction /
    // GC churn makes a random subset of queries 5–10× slower from
    // round to round (r3 vs r4 swings on identical code).
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timed = sweep.map { case (name, fn) =>
      name -> BenchHarness.minOfRunsCpu(spark, fn, sfDir, runs = 3)
    }
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val results = timed.map { case (k, (w, _)) => k -> w }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query CPU clock of the winning run (steal self-diagnosis):
    // a query whose wall >> cpu/ncpu with LOW cpu was throttled by the
    // host, not slow — full record only (target/bench.json + full line)
    val qcpu = timed.map { case (k, (_, c)) => "\"" + k + "\":" + r3(c) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val ncpu = Runtime.getRuntime.availableProcessors
    val loadFields =
      s""""load1_before":${load1Before},"load1_after":${load1()},""" +
        s""""proc_cpu_sec":${r3(procCpuSec() - cpuBefore)},""" +
        s""""wall_sec":${r3(wallSec)},"ncpu":$ncpu"""
    // Two SEPARATELY-LABELED per-query lines (r14 verdict item 2): the
    // driver captures the log TAIL, and in BENCH_r14 that capture
    // landed inside a combined line's query_cpu dict — CPU seconds
    // read as wall regressions. CPU prints FIRST (sacrificial if
    // truncation hits), the wall line after it, the compact summary
    // LAST; every line carries its own metric/unit labels so any
    // fragment is self-identifying.
    val cpuJson =
      s"""{"metric":"per_query_cpu","unit":"cpu_sec","note":"JVM CPU clock of the min-wall run; NOT wall time","query_cpu_sec":$qcpu,"sf":"$sfDir"}"""
    val wallJson =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,$loadFields,"queries":$qs,"sf":"$sfDir"}"""
    // Full record to files the driver (or a human) can read whole.
    // target/bench.json is clobbered by every run — the driver's
    // post-close sweep destroyed r14's closing idle record — so
    // SPARK_GRAFT_BENCH_COPY names an additional round-stamped,
    // COMMITTED copy (bench/bench_rNN_idle.json) that survives it.
    val record = cpuJson + "\n" + wallJson + "\n"
    def writeRecord(path: java.nio.file.Path): Unit =
      try {
        if (path.getParent != null)
          java.nio.file.Files.createDirectories(path.getParent)
        java.nio.file.Files.write(path,
          record.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case _: Throwable => }
    writeRecord(java.nio.file.Paths.get("target", "bench.json"))
    sys.env.get("SPARK_GRAFT_BENCH_COPY")
      .foreach(p => writeRecord(java.nio.file.Paths.get(p)))
    println(cpuJson)
    println(wallJson)
    // Compact line LAST — the driver keeps the tail of the log, so
    // the summary must be the final line to survive truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,$loadFields,"sf":"$sfDir"}""")
    spark.stop()
  }
}
