package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gaussian NB: classification on separable data, model determinism
  * under repartitioning, and the variance floor for degenerate
  * dimensions. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(label: Int, center: Array[Double], n: Int,
      seed: Int): Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = center.map(c => (c + rnd.nextGaussian() * 0.05).toFloat)
      ((label * 1000 + i).toLong, label, v)
    }
  }

  private lazy val separable = {
    val a = cluster(0, Array(0.0, 0.0, 0.0, 0.0), 40, 1)
    val b = cluster(1, Array(5.0, 5.0, 5.0, 5.0), 40, 2)
    val c = cluster(2, Array(-5.0, 5.0, -5.0, 5.0), 40, 3)
    (a ++ b ++ c).toDF("vec_id", "label", "embedding").cache()
  }

  test("perfectly separates well-separated clusters") {
    val stats = NaiveBayes.gaussStats(separable)
    val pri = NaiveBayes.logPriors(separable)
    val pred = NaiveBayes.predict(
      NaiveBayes.scores(separable, stats, pri)).collect()
    assert(pred.length == 120)
    assert(pred.forall(r => r.getAs[Int]("pred") == r.getAs[Int]("label_true")))
  }

  test("model is partitioning-independent") {
    val a = NaiveBayes.gaussStats(separable)
      .orderBy(col("label"), col("pos")).collect().toSeq
    val b = NaiveBayes.gaussStats(separable.repartition(7))
      .orderBy(col("label"), col("pos")).collect().toSeq
    assert(a == b)
  }

  test("variance floor applies on a constant dimension") {
    val df = Seq(
      (1L, 0, Array(1.0f, 2.0f)),
      (2L, 0, Array(1.0f, 3.0f)),
      (3L, 1, Array(4.0f, 5.0f))).toDF("vec_id", "label", "embedding")
    val stats = NaiveBayes.gaussStats(df)
    val v = stats.filter(col("label") === 0 && col("pos") === 0)
      .select(col("var")).head().getDouble(0)
    assert(v == NaiveBayes.VarFloor)
    // priors: ln(2/3), ln(1/3) snapped
    val lp = NaiveBayes.logPriors(df).orderBy(col("label"))
      .select(col("lp0")).as[Double].collect().toSeq
    assert(lp == Seq(Num.j(math.log(2.0 / 3.0), 8), Num.j(math.log(1.0 / 3.0), 8)))
  }
}
