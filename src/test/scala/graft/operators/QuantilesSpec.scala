package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Quantiles.exactQuantiles must be value-identical to Spark's
  * `percentile` aggregate (whose interpolation DuckDB's quantile_cont
  * mirrors — q37's oracle contract): same lower/upper neighbors, same
  * lower + (upper−lower)·frac arithmetic, bit-for-bit. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches percentile() bit-for-bit on random data with ties") {
    val rnd = new Random(3)
    // ÷7 makes repeating non-terminating doubles; ties are frequent
    val df = (0 until 20000)
      .map(_ => (rnd.nextInt(5), math.floor(rnd.nextDouble() * 1000) / 7.0))
      .toDF("g", "v").cache()
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.977, 1.0)
    val names = ps.map(p => s"q${(p * 1000).toInt}")
    val builtin = df.groupBy(col("g"))
      .agg(ps.zip(names).map { case (p, n) =>
        expr(s"percentile(v, $p)").as(n)
      }.head, ps.zip(names).map { case (p, n) =>
        expr(s"percentile(v, $p)").as(n)
      }.tail: _*)
      .orderBy(col("g")).collect().map(_.toSeq.drop(1))
    val ours = Quantiles.exactQuantiles(df, "g", "v", ps, names)
      .orderBy(col("g")).collect().map(_.toSeq.drop(2))
    assert(ours.toSeq == builtin.toSeq)
  }

  test("single-row group and single-value group degenerate correctly") {
    val df = Seq((1, 42.0), (2, 7.0), (2, 7.0), (2, 7.0)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v",
      Seq(0.5, 0.95), Seq("p50", "p95"))
      .orderBy(col("g"))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 42.0, 42.0), (2, 3L, 7.0, 7.0)))
  }

  test("n column counts rows, not distinct values") {
    val df = Seq((1, 5.0), (1, 5.0), (1, 9.0)).toDF("g", "v")
    val n = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5), Seq("p50"))
      .select("n").as[Long].head()
    assert(n == 3L)
  }

  test("NULL values are ignored: ranks, n, and all-NULL groups match percentile()") {
    // percentile()/quantile_cont ignore NULLs; before the isNotNull
    // filter, NULLs entered the count table, sorted FIRST in the
    // cumulative window, and shifted every rank
    val df = Seq[(Int, java.lang.Double)](
      (1, 1.0), (1, null), (1, 3.0), (1, null), (1, 5.0),
      (2, null), (2, null), // all-NULL group: no output row
      (3, 7.0)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v",
      Seq(0.5, 1.0), Seq("p50", "p100"))
      .orderBy(col("g"))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 3.0, 5.0), (3, 1L, 7.0, 7.0)))
    val builtin = df.filter(col("v").isNotNull).groupBy(col("g"))
      .agg(expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 1.0)").as("p100"))
      .orderBy(col("g")).as[(Int, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._3, r._4)) == builtin)
  }

  test("q37's plan has no group-buffering Percentile aggregate") {
    val d = graft.SparkEntry.queries("q37_quantiles")(
      spark, "/root/testdata/sf0.001")
    d.count()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "Percentile agg crept back in")
  }
}
