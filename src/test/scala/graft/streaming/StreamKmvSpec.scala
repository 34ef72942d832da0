package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Kmv

/** Streamed KMV synopsis state equals the batch synopsis of the same
  * prefix EXACTLY — the sketch is an order statistic of a
  * deterministic hash, so incremental maintenance loses nothing. */
class StreamKmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private val rows: Seq[(String, Long)] =
    (1 to 300).map(i => ("a", (i % 120).toLong)) ++
      (1 to 100).map(i => ("b", (i % 7).toLong))

  test("streamed estimates converge to the exact batch synopsis per key") {
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamKmv.distinctEstimates(
        in.toDF().toDF("key", "item"), "item", "key", K)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_mem").start()
    try {
      in.addData(rows.take(150))
      q.processAllAvailable()
      in.addData(rows.drop(150))
      q.processAllAvailable()
    } finally q.stop()

    // final state per key: the synopsis only grows (support up, then
    // hk down once full), so the last update is (max support, min hk)
    val streamed = spark.table("kmv_mem")
      .groupBy(col("key"))
      .agg(max(struct(col("support"), (-col("hk")).as("nhk"),
        col("estimate"))).as("m"))
      .collect().map { r =>
        val m = r.getStruct(1)
        r.getString(0) -> (m.getLong(0), -m.getDouble(1), m.getDouble(2))
      }.toMap

    for ((key, exp) <- Seq("a" -> 120L, "b" -> 7L)) {
      val batch = rows.filter(_._1 == key).map(_._2).toDF("item")
      val syn = Kmv.synopsis(batch.select(Kmv.normHash(col("item"))), K)
      val (n, hk) = Kmv.stats(syn, K)
      val est = Kmv.estimate(n, hk, K)
      assert(streamed(key) == ((n, hk, est)), s"key $key")
      // key b has support < k: the estimate is EXACT
      if (exp < K) assert(est == exp.toDouble)
    }
  }

  test("per-key state is bounded by k regardless of stream volume") {
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamKmv.distinctEstimates(
        in.toDF().toDF("key", "item"), "item", "key", K)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_mem2").start()
    try {
      in.addData((1 to 5000).map(i => ("big", i.toLong)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("kmv_mem2").orderBy(col("support").desc).head()
    assert(last.getAs[Long]("support") == K.toLong)
    // 5000 distinct, k=16 → crude estimate but the right magnitude
    val est = last.getAs[Double]("estimate")
    assert(est > 1500 && est < 15000)
  }
}
