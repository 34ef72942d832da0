package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming session windows (W2's streaming deployment — q17 is the
  * batch/oracle form): watermarked session_window aggregation with
  * cross-batch merge, emitted once the watermark closes the session. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions merge across micro-batches and close on watermark") {
    val in = MemoryStream[(Long, Timestamp)](spark)
    val sessions = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .select(col("user_id"), col("events_in_session"),
        unix_timestamp(col("session_window.start")).as("start_ts"),
        unix_timestamp(col("session_window.end")).as("end_ts"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_mem").start()
    try {
      // two events 5 min apart (same session), split across batches
      in.addData((1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // an event far in the future advances the watermark past the
      // session end → the merged session is emitted
      in.addData((2L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val out = spark.table("sess_mem")
        .select("user_id", "events_in_session", "start_ts", "end_ts")
        .as[(Long, Long, Long, Long)].collect()
      val u1 = out.filter(_._1 == 1L)
      assert(u1.length == 1, out.mkString(","))
      // one merged session: 2 events, [10:00, 10:05 + 10min gap)
      assert(u1(0)._2 == 2L)
      assert(u1(0)._4 - u1(0)._3 == (5 + 10) * 60)
    } finally q.stop()
  }
}
