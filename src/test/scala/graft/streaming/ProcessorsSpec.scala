package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model._

/** Batch-mode verification of the four processors against hand-computed
  * sliding windows (SURVEY.md §5a). The same expressions run in
  * streaming — StreamingSpec covers the incremental path. */
class ProcessorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def orderEvent(id: String, orderId: String, status: String,
      at: String, cust: String = "c1"): (OrderEvent, Timestamp) =
    (OrderEvent(id, "order_created", at, orderId, Some(cust), Some(status),
      None, None, Some(at)), ts(at))

  private def ordersDf(rows: (OrderEvent, Timestamp)*) =
    rows.toSeq.toDF("e", "event_timestamp").select($"e.*", $"event_timestamp")

  test("funnel: conditional stage counts and rates over sliding windows") {
    // Two orders in [10:00:00,10:01:00): one delivered, one canceled.
    // Window 1m slide 30s → each event also lands in the window starting
    // 30s earlier.
    val df = ordersDf(
      orderEvent("e1", "o1", "delivered", "2024-01-01 10:00:05"),
      orderEvent("e2", "o2", "canceled", "2024-01-01 10:00:20"),
      orderEvent("e3", "o3", "created", "2024-01-01 10:01:10"))
    val out = Processors.funnel(df).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1)

    // windows: 09:59:30 (e1,e2), 10:00:00 (e1,e2), 10:00:30 (e3? no —
    // e3 at 10:01:10 is in 10:00:30 and 10:01:00), 10:01:00 (e3)
    assert(out.length == 4)
    val w0 = out(0) // 09:59:30–10:00:30: e1 delivered, e2 canceled
    assert(w0._2 == 2) // total
    assert(w0._3 == 1) // with_items (not canceled)
    assert(w0._4 == 1) // with_payment (delivered)
    assert(w0._5 == 50.0) // items conversion = 1/2
    assert(w0._6 == 100.0) // payment conversion = 1/1
    val w2 = out(2) // 10:00:30–10:01:30: e3 created
    assert(w2._2 == 1 && w2._3 == 1 && w2._4 == 0)
    assert(w2._6 == 0.0) // 0 payment / 1 item → 0.0 (reference's otherwise)
  }

  test("funnel: zero denominator yields 0.0 not null (reference semantics)") {
    val df = ordersDf(orderEvent("e1", "o1", "canceled", "2024-01-01 10:00:05"))
    val rates = Processors.funnel(df)
      .select("items_conversion_rate", "payment_conversion_rate").collect()
    assert(rates.forall(r => r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0))
  }

  test("gmv: total_value = price + freight, min/max/avg per window") {
    val items = Seq(
      (ItemEvent("i1", "item_added", "t", "o1", Some(1), Some("p1"), Some("s1"),
        Some(10.0), Some(2.0), None), ts("2024-01-01 10:00:05")),
      (ItemEvent("i2", "item_added", "t", "o1", Some(2), Some("p2"), Some("s1"),
        Some(30.0), Some(3.0), None), ts("2024-01-01 10:00:10")))
      .toDF("e", "event_timestamp").select($"e.*", $"event_timestamp")
    val row = Processors.gmv(items)
      .filter(col("window_start") === lit(ts("2024-01-01 10:00:00")))
      .collect().head
    assert(row.getDouble(2) == 45.0) // gmv = 12 + 33
    assert(row.getLong(3) == 2) // item_count
    assert(row.getDouble(5) == 20.0) // avg price
    assert(row.getDouble(6) == 30.0) // max
    assert(row.getDouble(7) == 10.0) // min
  }

  test("dropoff: alert fires only for drop-off statuses above threshold") {
    val rows = (1 to 7).map(i =>
      orderEvent(s"e$i", s"o$i", "canceled", "2024-01-01 10:00:05", s"c$i")) ++
      (1 to 7).map(i =>
        orderEvent(s"d$i", s"od$i", "delivered", "2024-01-01 10:00:05", s"c$i"))
    val out = Processors.dropOff(ordersDf(rows: _*))
      .filter(col("window_start") === lit(ts("2024-01-01 10:00:00")))
      .collect().map(r => (r.getString(2), r.getLong(3), r.getBoolean(6),
        r.getSeq[String](7)))
    val canceled = out.find(_._1 == "canceled").get
    val delivered = out.find(_._1 == "delivered").get
    assert(canceled._2 == 7 && canceled._3) // dropped_orders, alert
    assert(delivered._2 == 0 && !delivered._3) // success status: no drop count
    assert(canceled._4 == Seq("o1", "o2", "o3")) // deterministic sorted sample
  }

  test("payment: success = value notNull and > 0; rates and installments") {
    val pays = Seq(
      (PaymentEvent("p1", "payment_processed", "t", "o1", Some(1),
        Some("credit_card"), Some(3), Some(100.0), None), ts("2024-01-01 10:00:05")),
      (PaymentEvent("p2", "payment_processed", "t", "o2", Some(1),
        Some("credit_card"), None, Some(0.0), None), ts("2024-01-01 10:00:10")),
      (PaymentEvent("p3", "payment_processed", "t", "o3", Some(1),
        Some("credit_card"), Some(12), None, None), ts("2024-01-01 10:00:15")))
      .toDF("e", "event_timestamp").select($"e.*", $"event_timestamp")
    val row = Processors.payment(pays)
      .filter(col("window_start") === lit(ts("2024-01-01 10:00:00")))
      .collect().head
    assert(row.getLong(3) == 3) // transaction_count
    assert(row.getDouble(5) == 100.0) // total (null→0)
    assert(row.getDouble(6) == 33.33) // avg over 3 with null→0
    assert(row.getLong(9) == 1 && row.getLong(10) == 2) // success/failed
    assert(row.getDouble(11) == 33.33) // success_rate
    assert(row.getDouble(7) == 5.33) // avg installments (3, 1 default, 12)
    assert(row.getInt(8) == 12) // max installments
  }

  test("upsert SQL shape") {
    val sql = MetricsSink.upsertSql("gmv_metrics",
      Seq("window_start", "window_end", "gmv"), Seq("window_start", "window_end"))
    assert(sql ==
      "INSERT INTO gmv_metrics (window_start, window_end, gmv) VALUES (?, ?, ?) " +
        "ON CONFLICT (window_start, window_end) DO UPDATE SET gmv = EXCLUDED.gmv")
  }
}
