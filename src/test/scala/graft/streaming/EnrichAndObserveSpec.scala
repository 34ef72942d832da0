package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import graft.SparkSpec

/** Stream–static dimension enrichment and the Observation metrics API
  * (data-quality counters piggybacked on a query, no second pass). */
class EnrichAndObserveSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static join enriches each micro-batch from the dim table") {
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double, Timestamp)](spark)
    val stream = in.toDF().toDF("user_id", "value", "ts")
    val q = StreamJoins.enrichWithDim(stream, dim, Seq("user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_mem").start()
    try {
      in.addData((1L, 10.0, Timestamp.valueOf("2024-01-01 10:00:00")),
        (3L, 5.0, Timestamp.valueOf("2024-01-01 10:00:01")))
      q.processAllAvailable()
      val out = spark.table("enrich_mem").select("user_id", "tier")
        .as[(Long, Option[String])].collect().sortBy(_._1)
      assert(out.sameElements(Array((1L, Some("GOLD")), (3L, None))))
    } finally q.stop()
  }

  test("Observation reports row and null counters from the same pass") {
    val obs = Observation("qc")
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"))
      .filter(col("event_type") === "purchase")
    val purchases = df.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > purchases)
    assert(m("null_values").asInstanceOf[Long] == 0L)
  }
}
