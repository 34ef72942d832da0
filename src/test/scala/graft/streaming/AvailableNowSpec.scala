package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Trigger.AvailableNow — the catch-up / incremental-batch mode: drain
  * the backlog, stop, and resume from checkpointed offsets on the next
  * scheduled run. This is how the 24/7 topology runs as a periodic
  * batch job at scale without semantic changes. */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", StringType),
    StructField("value", DoubleType)))

  test("drains the backlog, stops, and resumes from the checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("graft-an").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def runOnce(): Long = {
      val stream = spark.readStream.schema(schema).json(in)
        .withColumn("v2", col("value") * 2)
      val q = stream.writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query must terminate on its own")
      spark.read.parquet(out).count()
    }

    Seq("""{"event_id":"a","value":1.0}""", """{"event_id":"b","value":2.0}""")
      .toDF("value").coalesce(1).write.mode("append").text(in)
    assert(runOnce() == 2)

    // second run with the same checkpoint: only the NEW file processed
    Seq("""{"event_id":"c","value":3.0}""")
      .toDF("value").coalesce(1).write.mode("append").text(in)
    assert(runOnce() == 3)
    val vals = spark.read.parquet(out).select("v2").as[Double].collect().sorted
    assert(vals.sameElements(Array(2.0, 4.0, 6.0)))
  }
}
