package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.NaiveBayes

/** Streamed Gaussian-NB classification is bit-equal to the batch
  * scorer under the same trained model, across micro-batch
  * boundaries, with a stateless plan. */
class StreamNbSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(label: Int, center: Array[Double], n: Int,
      seed: Int): Seq[(Long, Int, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = center.map(c => (c + rnd.nextGaussian() * 0.2).toFloat)
      ((label * 1000 + i).toLong, label, v)
    }
  }

  private lazy val train = (cluster(0, Array(0.0, 0.0, 0.0), 30, 1) ++
    cluster(1, Array(3.0, -2.0, 1.0), 30, 2) ++
    cluster(2, Array(-3.0, 2.0, -1.0), 30, 3))
    .toDF("vec_id", "label", "embedding").cache()

  private lazy val testRows = (cluster(0, Array(0.1, 0.0, 0.1), 10, 4) ++
    cluster(1, Array(2.9, -2.0, 1.1), 10, 5) ++
    cluster(2, Array(-3.1, 2.1, -0.9), 10, 6))

  test("streamed predictions ≡ batch predict under the trained model") {
    val stats = NaiveBayes.gaussStats(train)
    val priors = NaiveBayes.logPriors(train)
    val test = testRows.toDF("vec_id", "label", "embedding")
    val expected = NaiveBayes.predict(
        NaiveBayes.scores(test, stats, priors))
      .select(col("vec_id"), col("pred"), col("score"))
      .as[(Long, Int, Double)].collect().toSet

    val model = StreamNb.collectModel(stats, priors)
    val in = MemoryStream[(Long, Int, Array[Float])](spark)
    val q = StreamNb.classified(
        in.toDF().toDF("vec_id", "label", "embedding"), model)
      .select(col("vec_id"), col("pred"), col("score"))
      .writeStream.outputMode("append")
      .format("memory").queryName("nb_mem").start()
    try {
      in.addData(testRows.take(12))
      q.processAllAvailable()
      in.addData(testRows.drop(12))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("nb_mem")
      .as[(Long, Int, Double)].collect().toSet
    assert(streamed == expected && streamed.size == 30)
  }

  test("scoring runs the codegen fold and matches the HOF form bit-for-bit") {
    import org.apache.spark.sql.functions._
    val stats = NaiveBayes.gaussStats(train)
    val priors = NaiveBayes.logPriors(train)
    val model = StreamNb.collectModel(stats, priors)
    // repartition defeats ConvertToLocalRelation, so the fold runs at
    // execution (whole-stage codegen), not at optimization time
    val test = testRows.toDF("vec_id", "label", "embedding").repartition(3)
    val out = StreamNb.classified(test, model)
    assert(out.queryExecution.executedPlan.toString.contains("vec_gauss_score"))
    // HOF twin computed here: same snapped contributions, fold order
    val (lbl, lp0, m, v, c0) = model.head
    val hof = test.select(col("vec_id"),
      graft.operators.Num.r4(lit(lp0) + aggregate(
        transform(sequence(lit(0), lit(m.length - 1)), i => {
          val x = element_at(col("embedding"), i + 1).cast("double")
          val mi = element_at(typedLit(m), i + 1)
          val vi = element_at(typedLit(v), i + 1)
          val ci = element_at(typedLit(c0), i + 1)
          graft.operators.Num.r(ci - (x - mi) * (x - mi) / (lit(2.0) * vi), 8)
        }), lit(0.0), (acc, x) => acc + x)).as("s_hof"))
      .as[(Long, Double)].collect().toMap
    val expr = StreamNb.classified(test, model.take(1))
      .select(col("vec_id"), col("score")).as[(Long, Double)].collect().toMap
    // with a single candidate class the argmax score IS class 0's fold
    assert(expr == hof)
    assert(lbl == model.head._1)
  }

  test("classification is stateless and classifies separable data correctly") {
    val classify = StreamNb.trainedClassifier(train)
    val in = MemoryStream[(Long, Int, Array[Float])](spark)
    val q = classify(in.toDF().toDF("vec_id", "label", "embedding"))
      .writeStream.outputMode("append")
      .format("memory").queryName("nb_mem2").start()
    try {
      in.addData(testRows)
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally q.stop()
    val rows = spark.table("nb_mem2")
      .select(col("label"), col("pred")).as[(Int, Int)].collect()
    assert(rows.length == 30 && rows.forall { case (l, p) => l == p })
  }
}
