package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LogisticGd: learns separable data, decreases loss, and is
  * deterministic under repartitioning (the snap contract). */
class LogisticGdSpec extends SparkSpec {
  import spark.implicits._

  // y = 1 iff x1 > 0.55 with a margin band removed — separable
  private def toy(n: Int) = (0 until n).map { i =>
    val x = (i % 100) / 100.0
    (1.0, x, if (x > 0.55) 1.0 else 0.0)
  }.filter(r => math.abs(r._2 - 0.55) > 0.05)
    .toDF("x0", "x1", "y")

  private def loss(df: org.apache.spark.sql.DataFrame, w: Array[Double]): Double = {
    val z = LogisticGd.linearScore(w.toSeq)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    df.agg(avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))))
      .as[Double].head()
  }

  test("loss decreases monotonically and accuracy reaches 1.0 on separable data") {
    val df = toy(400).cache()
    val losses = (1 to 4).map { r =>
      loss(df, LogisticGd.fit(df, 2, iters = r * 5, lr = 5.0))
    }
    assert(losses.sliding(2).forall { case Seq(a, b) => b < a })
    val w = LogisticGd.fit(df, 2, iters = 60, lr = 5.0)
    val z = LogisticGd.linearScore(w.toSeq)
    val acc = df.agg(avg(when((z >= 0) === (col("y") === 1.0), 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(acc == 1.0, s"acc=$acc w=${w.toSeq}")
    // the learned boundary slopes the right way: +x1 pushes toward 1
    assert(w(1) > 0 && w(0) < 0)
  }

  test("weights are identical under any partitioning (snap contract)") {
    val df = toy(400)
    val a = LogisticGd.fit(df.repartition(1), 2, iters = 6, lr = 2.0).toSeq
    val b = LogisticGd.fit(df.repartition(13), 2, iters = 6, lr = 2.0).toSeq
    assert(a == b)
  }

  test("snap8 is the JVM twin of Num.r(c, 8)") {
    val xs = Seq(0.123456785, -3.1e-9, 1.0 / 3.0, 2.0000000049999, 0.0)
    val viaCol = xs.toDF("x").select(Num.r(col("x"), 8)).as[Double].collect().toSeq
    assert(xs.map(LogisticGd.snap8) == viaCol)
  }
}
