package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.LogisticGd

/** Streamed classifier scores are bit-equal to batch scores under the
  * same trained weights, across micro-batch boundaries. */
class StreamScoreSpec extends SparkSpec {
  import spark.implicits._

  private val docsRows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away", "en"),
    (2L, "le chat est sur la table et il dort tranquillement", "fr"),
    (3L, "der hund ist gross und die katze ist klein", "de"),
    (4L, "a a a a a 1 2 3 4 5 6 7 8 9", "und"),
    (5L, "the cat is on the mat and the dog is in the yard", "en"))

  test("streamed scores ≡ batch scores under the trained model") {
    val batch = docsRows.toDF("doc_id", "text", "lang")
    val feat = LogisticGd.qualityFeatures(batch)
      .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
    val w = LogisticGd.fit(feat, LogisticGd.QualityDim, iters = 4, lr = 2.0)

    val expected = StreamScore.scored(batch, w.toSeq)
      .select("doc_id", "score", "pred")
      .as[(Long, Double, Long)].collect().toSet

    val in = MemoryStream[(Long, String, String)](spark)
    val q = StreamScore.scored(in.toDF().toDF("doc_id", "text", "lang"), w.toSeq)
      .select("doc_id", "score", "pred")
      .writeStream.outputMode("append")
      .format("memory").queryName("score_mem").start()
    try {
      in.addData(docsRows.take(2))
      q.processAllAvailable()
      in.addData(docsRows.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("score_mem")
      .as[(Long, Double, Long)].collect().toSet
    assert(streamed == expected && streamed.size == 5)
  }

  test("scoring is stateless: the plan carries no state store") {
    val in = MemoryStream[(Long, String, String)](spark)
    val scored = StreamScore.scored(in.toDF().toDF("doc_id", "text", "lang"),
      Seq(-1.0, 0.5, 0.5, 0.5, 0.5))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("score_mem2").start()
    try {
      in.addData(docsRows.take(1))
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally q.stop()
  }
}
