package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Adversarial edge-case properties for the statistical tier
  * (q177/q178/q179). The testdata happens to avoid these boundaries —
  * Kaplan–Meier extinction (d = n_risk, the ln(0) guard), Mann–Whitney
  * all-ties (variance → 0), Benford on a single-digit corpus — so each
  * guard gets generator-driven coverage here: tables are synthesized
  * into a temp scale-factor dir and the REAL query functions run on it
  * (no reimplemented logic to drift from). */
class StatEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  /** Write synthetic tables into a fresh subdir (one per iteration,
    * all under a per-suite root deleted in afterAll) shaped like a
    * testdata SF dir; returns the dir path. */
  private lazy val synthRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-statedge")
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

  // ---- Kaplan–Meier (q178): users as (viewDay, purchaseDay?) pairs;
  // small cohorts make full-extinction days (d = n_risk) common. ----
  private val kmUsersGen: Gen[List[(Int, Option[Int])]] =
    Gen.nonEmptyListOf(for {
      viewDay <- Gen.chooseNum(0, 3)
      // high purchase probability + tiny day range ⇒ extinction likely
      purchase <- Gen.option(Gen.chooseNum(0, 2))
    } yield (viewDay, purchase))

  test("q178 KM: extinction day flips surv to exactly 0; never NaN/negative") {
    check(Prop.forAll(kmUsersGen) { users =>
      val rows = users.zipWithIndex.flatMap { case ((vd, p), uid) =>
        val view = (uid.toLong * 10, new Timestamp(day0 + vd * 86400000L),
          uid.toLong, "view", 1.0, "{}")
        val buy = p.map(pd => (uid.toLong * 10 + 1,
          new Timestamp(day0 + (vd + pd) * 86400000L + 3600000L),
          uid.toLong, "purchase", 5.0, "{}"))
        view :: buy.toList
      }
      val dir = synthDir("events" ->
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      val out = graft.queries.JourneyQueries.q178KaplanMeier(spark, dir)
        .select(col("cohort"), col("t"), col("n_risk"), col("d_events"),
          col("surv"))
        .as[(Long, Int, Long, Long, Double)].collect()
      val noBadValues = out.forall { case (_, _, nRisk, d, s) =>
        !s.isNaN && s >= 0.0 && s <= 1.0 && d <= nRisk
      }
      val byCohort = out.groupBy(_._1).values
      val monotone = byCohort.forall { rs =>
        val survs = rs.sortBy(_._2).map(_._5)
        survs.zip(survs.drop(1)).forall { case (a, b) => b <= a + 1e-12 }
      }
      // from the first d = n_risk day on, survival is exactly zero
      val extinctionZero = byCohort.forall { rs =>
        val sorted = rs.sortBy(_._2)
        sorted.indexWhere(r => r._4 == r._3) match {
          case -1 => true
          case i  => sorted.drop(i).forall(_._5 == 0.0)
        }
      }
      noBadValues && monotone && extinctionZero
    })
  }

  // ---- Mann–Whitney (q179): docs as (n_chars, isEnglish). ----
  private val mwDocsGen: Gen[List[(Long, Boolean)]] = Gen.oneOf(
    // all-ties corpus: every value identical ⇒ tie-corrected σ² = 0
    Gen.chooseNum(1, 5).flatMap(v =>
      Gen.nonEmptyListOf(Gen.oneOf(true, false)).map(_.map(g => (v.toLong, g)))),
    // general corpus with heavy tie mass
    Gen.nonEmptyListOf(for {
      v <- Gen.chooseNum(1, 4)
      g <- Gen.oneOf(true, false)
    } yield (v.toLong, g)))

  test("q179 MW: all-ties variance → z null (guarded), U within [0, n1·n2]") {
    check(Prop.forAll(mwDocsGen) { docsList =>
      val rows = docsList.zipWithIndex.map { case ((v, en), i) =>
        (i.toLong, "t", if (en) "en" else "fr", "web", v)
      }
      val dir = synthDir("documents" ->
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val Array(r) = graft.queries.FeatureQueries.q179MannWhitney(spark, dir)
        .select(col("n1"), col("n2"), col("u"), col("z")).collect()
      val (n1, n2, u) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val z = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      val allTied = docsList.map(_._1).distinct.size == 1
      val degenerate = allTied || n1 == 0 || n2 == 0
      n1 + n2 == docsList.size.toLong &&
        u >= -1e-9 && u <= n1.toDouble * n2 + 1e-9 &&
        (if (degenerate) z.isEmpty else z.forall(v => !v.isNaN))
    })
  }

  // ---- Benford (q177): order totals, including single-digit and
  // sub-cent corpora. ----
  private val benfordGen: Gen[List[Double]] = Gen.oneOf(
    // single-digit corpus: every total leads with the same digit
    for {
      d <- Gen.chooseNum(1, 9)
      n <- Gen.chooseNum(1, 20)
      mults <- Gen.listOfN(n, Gen.chooseNum(1, 99))
    } yield mults.map(m => d * 100.0 + m / 100.0),
    Gen.nonEmptyListOf(Gen.chooseNum(1, 99999).map(_ / 100.0)))

  test("q177 Benford: digits partition the corpus; single-digit corpus is one exact row") {
    check(Prop.forAll(benfordGen) { totals =>
      val rows = totals.zipWithIndex.map { case (t, i) =>
        (i.toLong, i.toLong, "F", t, new Timestamp(day0), "1-URGENT")
      }
      val dir = synthDir("orders" -> rows.toDF("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
      val out = graft.queries.WarehouseQueries.q177Benford(spark, dir)
        .select(col("digit"), col("n"), col("observed"), col("chi2_term"))
        .as[(Int, Long, Double, Double)].collect()
      val digitsOk = out.forall(r => r._1 >= 1 && r._1 <= 9)
      val countsOk = out.map(_._2).sum == totals.size.toLong
      val sharesOk = math.abs(out.map(_._3).sum - 1.0) < 1e-4
      val chiOk = out.forall(r => r._4 >= 0.0 && !r._4.isNaN)
      val singleDigit = totals.map(t =>
        math.floor(t * 100 + 0.5).toLong.toString.head).distinct.size == 1
      digitsOk && countsOk && sharesOk && chiOk &&
        (!singleDigit || (out.length == 1 && out.head._3 == 1.0))
    })
  }
}
