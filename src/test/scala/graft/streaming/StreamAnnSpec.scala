package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** Streaming IVF enrichment equals the batch ivfTopK for the same
  * query set, across micro-batch boundaries. */
class StreamAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streamed IVF top-k equals batch ivfTopK across micro-batches") {
    val sf = "/root/testdata/sf0.001"
    val corpus = Tables.load(spark, sf, "embeddings")
    val queryRows = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    assert(queryRows.size >= 4)

    val in = MemoryStream[(Long, Seq[Float])](spark)
    val out = StreamAnn.ivfEnrich(
      in.toDF().toDF("query_id", "qv"), corpus, k = 5)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("ann_mem").start()
    try {
      in.addData(queryRows.take(2))
      q.processAllAvailable()
      in.addData(queryRows.drop(2))
      q.processAllAvailable()

      val streamed = spark.table("ann_mem")
        .select("query_id", "rank", "nbr_id", "cos")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = Similarity.ivfTopK(corpus, col("vec_id") % 50 === 0, 5)
        .select(col("query_id"), col("rank").cast("long"), col("nbr_id"), col("cos"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("parity holds where the derived nlist exceeds the floor " +
      "(sf0.001 corpus derives the 16 floor; this sf0.1 corpus, 32)") {
    // regression pin for the round-12 review find: a fixed nlist=16
    // default silently diverged from the batch twin's derivation the
    // moment the corpus outgrew the floor — this corpus derives 32
    val sf = "/root/testdata/sf0.1"
    val corpus = Tables.load(spark, sf, "embeddings")
    assert(Similarity.deriveNlist(corpus.count()) > 16)
    val queryRows = corpus.filter(col("vec_id") % 400 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val out = StreamAnn.ivfEnrich(
      in.toDF().toDF("query_id", "qv"), corpus, k = 5)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("ann_mem32").start()
    try {
      in.addData(queryRows)
      q.processAllAvailable()
      val streamed = spark.table("ann_mem32")
        .select("query_id", "rank", "nbr_id", "cos")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = Similarity.ivfTopK(corpus, col("vec_id") % 400 === 0, 5)
        .select(col("query_id"), col("rank").cast("long"), col("nbr_id"), col("cos"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
