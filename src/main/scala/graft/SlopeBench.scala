package graft

import org.apache.spark.sql.SparkSession

/** Scale-slope sweep — runs every SparkEntry query at each SF in
  * SPARK_GRAFT_SLOPE_DIRS (default sf0.001,sf0.01,sf0.1) inside ONE
  * JVM and reports, per query, the time ratio between the two largest
  * SFs against their data ratio.
  *
  * Why: a single-SF bench ranks queries but cannot see an
  * accidentally-superlinear one until it tops the sweep — q24's
  * quadratic-in-collisions edge feed was found by eyeballing the r9
  * numbers, a slope gate would have flagged it structurally. A query
  * whose time grows faster than its input between sf0.01 and sf0.1
  * (beyond `SlopeSlack`, and above `TimeFloor` so fixed per-query
  * overhead — session, planning, job launch, typically ~0.2–0.4 s —
  * doesn't drown the signal) lands in `superlinear` in the output
  * line and in target/slope.json.
  *
  * Interpreting the flag: time_ratio < data_ratio is the norm here
  * (the fixed overhead amortizes); ≈ data_ratio is linear scaling;
  * sustained > data_ratio × slack on a query whose big-SF time is
  * real says the operator's work grows faster than its input — the
  * 100 TB red flag. One run per (query, SF) after the same warmup as
  * Bench; results land in BASELINE.md as the per-family slope table.
  */
object SlopeBench {
  private val TimeFloor = 1.0 // sec at the largest SF
  private val SlopeSlack = 1.5

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SLOPE_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
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

    def sfOf(dir: String): Double =
      "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble)
        .getOrElse(sys.error(s"cannot parse scale factor from $dir"))

    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // smallest SF first: its pass doubles as the codegen/session warmup
    val byDir = dirs.sortBy(sfOf).map { dir =>
      Tables.names.foreach { t =>
        try Tables.load(spark, dir, t).limit(1).count()
        catch { case _: Throwable => }
      }
      dir -> sweep.map { case (name, fn) =>
        val t = BenchHarness.minOfRuns(spark, fn, dir, runs = 2)
        // progress line per (dir, query): a hung sweep self-locates
        System.err.println(f"[slope] $dir $name $t%.2f s")
        name -> t
      }.toMap
    }
    val (bigDir, bigT) = byDir.last
    val (midDir, midT) = byDir(byDir.size - 2)
    val dataRatio = sfOf(bigDir) / sfOf(midDir)
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val rows = sweep.map(_._1).map { q =>
      val (tb, tm) = (bigT(q), midT(q))
      val ratio = if (tb > 0 && tm > 0) tb / tm else -1.0
      (q, tm, tb, ratio,
        tb >= TimeFloor && ratio > dataRatio * SlopeSlack)
    }
    val superlinear = rows.collect { case (q, _, _, _, true) => q }
    val perQuery = rows.map { case (q, tm, tb, ratio, _) =>
      s""""$q":{${byDir.map { case (d, t) =>
        "\"" + ("sf[0-9.]+".r.findFirstIn(d).getOrElse(d)) +
          "\":" + r3(t(q))
      }.mkString(",")},"ratio":${r3(ratio)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"slope","data_ratio":$dataRatio,"mid":"$midDir","big":"$bigDir",""" +
        s""""time_floor_sec":$TimeFloor,"slack":$SlopeSlack,""" +
        s""""superlinear":[${superlinear.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""queries":$perQuery}"""
    try {
      val out = java.nio.file.Paths.get("target", "slope.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => }
    println(json)
    // the one-line gate: non-empty superlinear list is the red flag
    println(s"""{"metric":"slope_gate","superlinear_count":${superlinear.size},"superlinear":[${superlinear.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
  }
}
