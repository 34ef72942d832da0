package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model._
import graft.sources.{EventParser, FileEventSource}

/** Incremental-execution verification: the same processors fed through
  * MemoryStream micro-batches, checkpointed, in update mode — the
  * reference's execution model (SURVEY.md §3.1). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def event(id: String, orderId: String, status: String, at: String) =
    (OrderEvent(id, "order_created", at, orderId, Some("c1"), Some(status),
      None, None, Some(at)), ts(at))

  test("funnel over MemoryStream micro-batches refines windows in update mode") {
    val input = MemoryStream[(OrderEvent, Timestamp)](spark)
    val orders = input.toDF().select($"_1.*", $"_2".as("event_timestamp"))
    val q = MetricsSink.memory(Processors.funnel(orders), "funnel_mem")
    try {
      input.addData(event("e1", "o1", "delivered", "2024-01-01 10:00:05"))
      q.processAllAvailable()
      val afterB1 = spark.table("funnel_mem")
        .filter($"window_start" === lit(ts("2024-01-01 10:00:00")))
        .select("total_orders").as[Long].collect()
      assert(afterB1.sameElements(Array(1L)))

      // second micro-batch adds an event to the SAME window → update mode
      // re-emits the refined row
      input.addData(event("e2", "o2", "canceled", "2024-01-01 10:00:20"))
      q.processAllAvailable()
      val afterB2 = spark.table("funnel_mem")
        .filter($"window_start" === lit(ts("2024-01-01 10:00:00")))
        .select("total_orders").as[Long].collect()
      // memory sink in update mode appends refinements; last emission has 2
      assert(afterB2.max == 2L)
    } finally q.stop()
  }

  test("streaming dedup drops cross-batch duplicate event_ids") {
    val input = MemoryStream[(OrderEvent, Timestamp)](spark)
    val orders = input.toDF().select($"_1.*", $"_2".as("event_timestamp"))
      .dropDuplicates("event_id")
    val q = MetricsSink.memory(
      orders.groupBy().agg(count(lit(1)).as("n")), "dedup_mem")
    try {
      input.addData(event("dup", "o1", "delivered", "2024-01-01 10:00:05"))
      q.processAllAvailable()
      input.addData(event("dup", "o1", "delivered", "2024-01-01 10:00:05"),
        event("new", "o2", "created", "2024-01-01 10:00:06"))
      q.processAllAvailable()
      val counts = spark.table("dedup_mem").as[Long].collect()
      assert(counts.max == 2L) // dup dropped across micro-batches
    } finally q.stop()
  }

  test("watermarked dedup + windowed agg bounds state (idiomatic mode)") {
    val input = MemoryStream[(OrderEvent, Timestamp)](spark)
    val orders = input.toDF().select($"_1.*", $"_2".as("event_timestamp"))
    val cfg = WindowConfig(watermark = Some("10 minutes"))
    val deduped = cfg.applyWatermark(orders).dropDuplicatesWithinWatermark("event_id")
    val q = MetricsSink.memory(Processors.funnel(deduped, cfg), "wm_mem", "append")
    try {
      input.addData(event("e1", "o1", "delivered", "2024-01-01 10:00:05"))
      input.addData(event("e2", "o2", "created", "2024-01-01 11:00:00"))
      q.processAllAvailable()
      // watermark passed 10:00 windows → they are finalized and emitted
      // in append mode
      val emitted = spark.table("wm_mem")
        .filter($"window_start" === lit(ts("2024-01-01 10:00:00")))
        .select("total_orders").as[Long].collect()
      assert(emitted.sameElements(Array(1L)))
    } finally q.stop()
  }

  test("e2e: generator files → file source → parse → funnel → parquet sink") {
    val root = Files.createTempDirectory("graft-e2e").toString
    EventGenerator.writeAll(spark, "/root/testdata/sf0.001", s"$root/events", 2)

    val parsed = EventParser.parse(
      FileEventSource(s"$root/events/orders", maxFilesPerTrigger = 1).load(spark),
      Schemas.order)
    val metrics = Processors.funnel(parsed.dropDuplicates("event_id"))
    val q = metrics.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("append").parquet(s"$root/out")
      }
      .start()
    try {
      q.processAllAvailable()
      val out = spark.read.parquet(s"$root/out")
      assert(out.count() > 0)
      // every emitted window has consistent stage counts
      val bad = out.filter($"orders_with_items" > $"total_orders" ||
        $"orders_with_payment" > $"orders_with_items").count()
      assert(bad == 0)
      // totals reconcile with the source (1500 orders at sf0.001; each in
      // 2 sliding windows; update-mode re-emissions make raw sums ≥ 2×,
      // so check the final refinement per window instead)
      val finalPerWindow = out.groupBy("window_start")
        .agg(max("total_orders").as("n"))
      val total = finalPerWindow.agg(sum("n")).as[Long].collect().head
      assert(total == 2 * 1500)
    } finally q.stop()
  }

  test("corrupt JSON rows are dropped by parse, visible on side channel") {
    val root = Files.createTempDirectory("graft-corrupt").toString
    Files.write(java.nio.file.Paths.get(s"$root/data.txt"),
      ("""{"event_id":"e1","event_type":"order_created","event_time":"t","order_id":"o1","customer_id":"c1","order_status":"created","timestamp":"2024-01-01T10:00:00"}""" +
        "\nnot-json at all\n").getBytes)
    val raw = spark.read.text(root).select(
      lit("k").as("key"), $"value",
      lit(ts("2024-01-01 10:00:00")).as("event_timestamp"))
    assert(EventParser.parse(raw, Schemas.order).count() == 1)
    assert(EventParser.corruptRecords(raw, Schemas.order).count() == 1)
  }
}
