package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window helpers shared by the batch analytics queries and the
  * streaming processors.
  *
  * The reference windows everything on a 1-minute window with a
  * 30-second slide (stream_processor.py:33-39, gmv_processor.py:27-33).
  * The same `window()` expression works identically on batch and
  * streaming DataFrames, which is what lets the DuckDB oracle verify
  * the streaming operators' semantics in batch mode (SURVEY.md §5).
  *
  * Windows are exposed as epoch-second longs (`window_start`) rather
  * than timestamps so oracle hash-comparison is exact across engines.
  */
object Windows {

  /** Attach sliding-window start column (epoch seconds). Each event
    * lands in `width/slide` windows; Spark expands rows before the
    * aggregation (map-side), so the shuffle carries pre-aggregated
    * partial rows only. */
  def withSlidingWindow(df: DataFrame, tsCol: String, width: String,
      slide: String): DataFrame =
    df.withColumn("w", window(col(tsCol), width, slide))
      .withColumn("window_start", unix_timestamp(col("w.start")))
      .withColumn("window_end", unix_timestamp(col("w.end")))
      .drop("w")

  /** Tumbling variant. */
  def withTumblingWindow(df: DataFrame, tsCol: String, width: String): DataFrame =
    df.withColumn("w", window(col(tsCol), width))
      .withColumn("window_start", unix_timestamp(col("w.start")))
      .withColumn("window_end", unix_timestamp(col("w.end")))
      .drop("w")

  /** DuckDB SQL fragment generating the same sliding windows:
    * an event at t belongs to windows starting at
    * floor(t/slide)*slide - k*slide for k in 0..(width/slide - 1),
    * keeping starts > t - width. Both engines align windows to the
    * 1970-01-01 epoch. */
  def duckSlidingFrom(table: String, tsCol: String, widthSec: Long,
      slideSec: Long): String = {
    val n = (widthSec / slideSec).toInt
    val ks = (0 until n).map(_.toString).mkString("[", ", ", "]")
    s"""(SELECT e.*,
       |   (CAST(floor(epoch($tsCol) / $slideSec) AS BIGINT) - g.k) * $slideSec AS window_start,
       |   (CAST(floor(epoch($tsCol) / $slideSec) AS BIGINT) - g.k) * $slideSec + $widthSec AS window_end
       | FROM $table e CROSS JOIN (SELECT unnest($ks) AS k) g
       | WHERE (CAST(floor(epoch($tsCol) / $slideSec) AS BIGINT) - g.k) * $slideSec > epoch($tsCol) - $widthSec)""".stripMargin
  }

  /** DuckDB SQL fragment for tumbling windows. */
  def duckTumblingFrom(table: String, tsCol: String, widthSec: Long): String =
    s"""(SELECT e.*,
       |   CAST(floor(epoch($tsCol) / $widthSec) AS BIGINT) * $widthSec AS window_start,
       |   CAST(floor(epoch($tsCol) / $widthSec) AS BIGINT) * $widthSec + $widthSec AS window_end
       | FROM $table e)""".stripMargin

  /** Guarded percentage: null when the denominator is zero (matches
    * CASE WHEN d > 0 THEN floor(n/d*100 * 100 + 0.5)/100 END). */
  def pct(n: Column, d: Column): Column =
    when(d > 0, Num.r2(n.cast("double") / d.cast("double") * 100))
}
