package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas
import graft.sources.{EventParser, FileEventSource}

/** Failure semantics: checkpoint restart continues state (no
  * reprocessing), and the idempotent sink deduplicates replayed
  * batches. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  private def orderJson(id: String, orderId: String, status: String,
      at: String): String =
    s"""{"event_id":"$id","event_type":"order_created","event_time":"$at",""" +
      s""""order_id":"$orderId","customer_id":"c1","order_status":"$status",""" +
      s""""timestamp":"$at"}"""

  test("restart from checkpoint: state continues, inputs not reprocessed") {
    val root = Files.createTempDirectory("graft-recover").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    def pipeline(): org.apache.spark.sql.streaming.StreamingQuery = {
      val parsed = EventParser.parse(
        FileEventSource(s"$root/in", maxFilesPerTrigger = 10).load(spark),
        Schemas.order)
      // cross-batch dedup state must survive the restart
      parsed.dropDuplicates("event_id")
        .groupBy(col("order_status"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          MetricsSink.idempotentParquetWriter(s"$root/out")(b, id)
        }
        .start()
    }
    Files.write(Paths.get(s"$root/in/f1.txt"),
      (orderJson("e1", "o1", "delivered", "2024-01-01T10:00:00") + "\n" +
        orderJson("e2", "o2", "created", "2024-01-01T10:00:05") + "\n").getBytes)
    val q1 = pipeline()
    q1.processAllAvailable()
    q1.stop()

    // new file with one duplicate event and one new one
    Files.write(Paths.get(s"$root/in/f2.txt"),
      (orderJson("e1", "o1", "delivered", "2024-01-01T10:00:00") + "\n" +
        orderJson("e3", "o3", "delivered", "2024-01-01T10:00:10") + "\n").getBytes)
    val q2 = pipeline() // restart from same checkpoint
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(s"$root/out")
    // latest refinement per status: e1 deduped across the restart →
    // delivered count stays 2 (o1 + o3), created stays 1
    val latest = out.groupBy($"order_status").agg(max($"n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(latest == Map("delivered" -> 2L, "created" -> 1L))
  }

  test("idempotent sink: a replayed batch id does not duplicate rows") {
    val dir = Files.createTempDirectory("graft-idem").toString
    val batch = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val write = MetricsSink.idempotentParquetWriter(dir)
    write(batch, 7L)
    write(batch, 7L) // replay after simulated failure
    val out = spark.read.parquet(dir)
    assert(out.count() == 2)
    assert(out.select(countDistinct($"batch_id")).as[Long].collect().head == 1)
  }
}
