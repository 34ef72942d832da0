package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the round-12 model/statistics additions: q185 Poisson
  * bootstrap, q186 Markov stationary distribution, q187 ridge
  * regression via normal equations. Synthetic tables go through the
  * REAL query functions (the StatEdgeSpec pattern); q187 additionally
  * pins the distributed solve bit-for-bit against a driver-side
  * evaluation of the identical Cramer expression tree.
  */
class ModelStatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val synthRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-modelstat")
  private val synthN = new java.util.concurrent.atomic.AtomicInteger(0)

  override def afterAll(): Unit = {
    graft.TempDirs.deleteRecursively(synthRoot)
    super.afterAll()
  }

  private def synthDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = synthRoot.resolve(s"it${synthN.getAndIncrement()}").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  private val day0 = 1704067200000L // 2024-01-01 UTC

  // ---- q185 Poisson bootstrap ----

  test("q185: bootstrap SE brackets the analytic sigma/sqrt(n); mean exact") {
    // values 10.00 or 30.00 with equal counts: sigma = 10, mean = 20
    val n = 2000
    val rows = (0 until n).map { i =>
      (i.toLong, new Timestamp(day0 + i * 1000L), i.toLong % 97,
        "purchase", if (i % 2 == 0) 10.0 else 30.0, "{}")
    }
    val dir = synthDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = graft.queries.QcQueries.q185Bootstrap(spark, dir)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 1)
    val (np, mean, se) = out.head
    assert(np == n)
    assert(mean == 20.0)
    val analytic = 10.0 / math.sqrt(n.toDouble) // 0.2236
    assert(se > analytic * 0.5 && se < analytic * 2.0,
      s"boot_se $se vs analytic $analytic")
  }

  test("q185: deterministic — two runs produce identical bytes") {
    val rows = (0 until 500).map { i =>
      (i.toLong, new Timestamp(day0 + i * 1000L), i.toLong % 31,
        "purchase", (i % 7) * 3.25, "{}")
    }
    val dir = synthDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val a = graft.queries.QcQueries.q185Bootstrap(spark, dir).collect()
    val b = graft.queries.QcQueries.q185Bootstrap(spark, dir).collect()
    assert(a.sameElements(b))
  }

  // ---- q186 Markov stationary distribution ----

  private def eventsOf(seqs: Seq[(Long, Seq[String])]): org.apache.spark.sql.DataFrame =
    seqs.flatMap { case (uid, types) =>
      types.zipWithIndex.map { case (t, i) =>
        (uid * 1000 + i, new Timestamp(day0 + i * 60000L), uid, t, 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q186: deterministic 2-cycle keeps the uniform distribution fixed") {
    // A->B->A->B...: doubly stochastic, uniform is stationary
    val dir = synthDir("events" ->
      eventsOf(Seq(1L -> Seq("A", "B", "A", "B", "A"))))
    val out = graft.queries.JourneyQueries.q186Markov(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(out == Map("A" -> 0.5, "B" -> 0.5))
  }

  test("q186: absorbing-chain hand case matches three exact rounds") {
    // A->A x3, A->B x1 (p = .75/.25); B->B (p = 1). pi1 = (.375,
    // .625) and pi2 = (.28125, .71875) are <= 6-decimal exact (the
    // per-round snap is the identity); round 3 gives exactly
    // (.2109375, .7890625) pre-snap, so the output is their Num.j
    // 6-decimal snap.
    val dir = synthDir("events" -> eventsOf(Seq(
      1L -> Seq("A", "A", "A", "A", "B"),
      2L -> Seq("B", "B"))))
    val out = graft.queries.JourneyQueries.q186Markov(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(out == Map("A" -> Num.j(0.2109375, 6), "B" -> Num.j(0.7890625, 6)))
  }

  test("q186: mass is conserved within snap error when no state dangles") {
    val dir = synthDir("events" -> eventsOf(Seq(
      1L -> Seq("A", "B", "C", "A", "C", "B", "A"),
      2L -> Seq("C", "C", "B", "A", "B"),
      3L -> Seq("B", "A", "A", "C"))))
    val out = graft.queries.JourneyQueries.q186Markov(spark, dir)
      .as[(String, Double)].collect()
    val mass = out.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
  }

  // ---- q187 ridge regression ----

  test("q187: recovers a planted linear model; solve pinned to driver Cramer") {
    // y = 7 + 3*x1 + 2*x2 exactly, on an integer grid with spread —
    // lambda=10 shrinkage is O(lambda/Sxx), far below the assert tol
    val rows = for {
      x1 <- 0 until 50; x2 <- 0 until 20
    } yield ("g1", x1.toLong, x2.toLong, 7L + 3 * x1 + 2 * x2)
    val df = rows.toDF("g", "x1", "x2", "y")
    val out = graft.queries.FeatureQueries.ridgeFromInts(df)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n, b0, b1, b2) = out.head
    assert(n == 1000)
    assert(math.abs(b0 - 7.0) < 0.05, s"b0 $b0")
    assert(math.abs(b1 - 3.0) < 0.01, s"b1 $b1")
    assert(math.abs(b2 - 2.0) < 0.01, s"b2 $b2")

    // driver-side twin: identical sums, identical association, Num.j snap
    val lam = 10.0
    val (nn, s1, s2) = (rows.size.toDouble,
      rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble)
    val s11 = rows.map(r => r._2 * r._2).sum.toDouble + lam
    val s12 = rows.map(r => r._2 * r._3).sum.toDouble
    val s22 = rows.map(r => r._3 * r._3).sum.toDouble + lam
    val sy = rows.map(_._4).sum.toDouble
    val s1y = rows.map(r => r._2 * r._4).sum.toDouble
    val s2y = rows.map(r => r._3 * r._4).sum.toDouble
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val dd = det3(nn, s1, s2, s1, s11, s12, s2, s12, s22)
    assert(b0 == Num.j(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / dd, 6))
    assert(b1 == Num.j(det3(nn, sy, s2, s1, s1y, s12, s2, s2y, s22) / dd, 6))
    assert(b2 == Num.j(det3(nn, s1, sy, s1, s11, s1y, s2, s12, s2y) / dd, 6))
  }

  test("q187: singular-free per-group solve on mixed groups") {
    val rows = (for {
      g <- Seq("a", "b"); x1 <- 0 until 30; x2 <- 0 until 10
    } yield (g, x1.toLong, x2.toLong,
      (if (g == "a") 10L else 100L) + 2 * x1 + 5 * x2 + (x1 % 3))).toSeq
    val out = graft.queries.FeatureQueries.ridgeFromInts(
      rows.toDF("g", "x1", "x2", "y"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.length == 2)
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    out.foreach { case (_, _, b0, b1, b2) =>
      assert(!b0.isNaN && !b1.isNaN && !b2.isNaN)
      assert(math.abs(b1 - 2.0) < 0.2 && math.abs(b2 - 5.0) < 0.2)
    }
  }
}
