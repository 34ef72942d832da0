package graft.streaming

import graft.SparkSpec
import graft.model.{OrderEvent, Schemas}
import graft.plans.AvroExpressions.{avro_decode, avro_encode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Kafka-value transport flow minus the broker: a stream of
  * Confluent-framed Avro payloads (what the reference's producer would
  * put on the wire, avro_schemas.py + the registry framing) decoded
  * and aggregated in Structured Streaming — results bit-equal to the
  * plain unencoded path across micro-batch boundaries. Stateless
  * decode: no watermark, no state store. */
class StreamAvroSpec extends SparkSpec {
  import spark.implicits._

  private val orders = Seq(
    OrderEvent("e1", "order_created", "2018-01-01T10:00:00", "o1",
      Some("c1"), Some("created"), None, None, Some("t1")),
    OrderEvent("e2", "order_created", "2018-01-01T10:01:00", "o2",
      Some("c2"), Some("created"), None, None, Some("t2")),
    OrderEvent("e3", "order_delivered", "2018-01-01T10:02:00", "o1",
      Some("c1"), Some("delivered"), None, None, Some("t3")),
    OrderEvent("e4", "order_canceled", "2018-01-01T10:03:00", "o3",
      None, Some("canceled"), None, None, Some("t4")),
    OrderEvent("e5", "order_created", "2018-01-01T10:04:00", "o4",
      Some("c4"), Some("created"), None, None, Some("t5")))

  private def countsByType(df: org.apache.spark.sql.DataFrame) =
    // one stateful level (streaming forbids count(DISTINCT) and chained
    // unwatermarked aggregates): counts + order-key extremes
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("order_id")).as("first_order"),
        max(col("order_id")).as("last_order"))

  test("framed-Avro stream ≡ plain stream across micro-batch boundaries") {
    val plain = countsByType(orders.toDF())
      .as[(String, Long, String, String)].collect().toSet

    // producer side: one framed Avro payload per event (schema id 42)
    val batch = orders.toDF()
    val payloads = batch
      .select(avro_encode(struct(batch.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events", schemaId = 42,
        wireSchema = Some(Schemas.orderWire)).as("value"))
      .as[Array[Byte]].collect().toSeq

    // consumer side: binary value column → decode → aggregate
    val in = MemoryStream[Array[Byte]](spark)
    val decoded = in.toDF().toDF("value")
      .select(avro_decode(col("value"), Schemas.orderWire,
        "OrderEvent", "com.ecommerce.events", schemaId = 42).as("r"))
      .select("r.*")
    val q = countsByType(decoded)
      .writeStream.outputMode("complete")
      .format("memory").queryName("avro_counts").start()
    try {
      in.addData(payloads.take(2))
      q.processAllAvailable()
      in.addData(payloads.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("avro_counts")
      .as[(String, Long, String, String)].collect().toSet
    assert(streamed == plain)
    assert(streamed.map(_._1) ==
      Set("order_created", "order_delivered", "order_canceled"))
  }

  test("decode is stateless: no state store in the projection") {
    val in = MemoryStream[Array[Byte]](spark)
    val decoded = in.toDF().toDF("value")
      .select(avro_decode(col("value"), Schemas.orderWire,
        "OrderEvent", "com.ecommerce.events").as("r"))
      .select("r.*")
    val q = decoded.writeStream.outputMode("append")
      .format("memory").queryName("avro_plain").start()
    try {
      val batch = orders.take(1).toDF()
      val p = batch.select(avro_encode(struct(batch.columns.map(col): _*),
        "OrderEvent", "com.ecommerce.events",
        wireSchema = Some(Schemas.orderWire)).as("v"))
        .as[Array[Byte]].collect().toSeq
      in.addData(p)
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"))
      assert(spark.table("avro_plain").count() == 1)
    } finally q.stop()
  }
}
