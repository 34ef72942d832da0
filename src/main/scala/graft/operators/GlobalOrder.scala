package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total ordering at scale: assign every row its rank under a
  * total order WITHOUT `row_number() OVER (ORDER BY ...)` — whose
  * empty window frame plans as Exchange SinglePartition and funnels
  * 100 TB through one reducer.
  *
  * Two-pass scheme (the classic distributed rank): range-repartition
  * on the order key (RangePartitioner assigns ascending, disjoint key
  * ranges to ascending partition ids), rank locally inside each
  * partition, then add the exclusive prefix sum of partition sizes —
  * ONE long per partition of driver state, the same bounded-model
  * shape as k-means centroids. Result is bit-identical to the
  * single-reducer window as long as the order key is a TOTAL order
  * (pass a tie-breaking column; with ties the rank of equal rows
  * would depend on partition placement).
  *
  * The count pass re-evaluates the ranged frame, so it is cached
  * across the two jobs — at 100 TB rely on shuffle reuse instead
  * (both jobs read the same exchange output) or checkpoint.
  */
object GlobalOrder {

  /** Add `posCol` (1-based global rank under `order`) to `df`.
    *
    * The local rank comes from `monotonically_increasing_id` evaluated
    * AFTER `sortWithinPartitions` — the DataFrame zipWithIndex idiom:
    * mid = (partitionId << 33) + rowIndexWithinPartition, so the local
    * index is `mid − (pid << 33)`. That keeps the whole computation in
    * the range exchange's stage; ranking with a window partitioned by
    * `_pid` would re-shuffle the already-partitioned data a second
    * time (Spark can't see that range output clusters `_pid`).
    * Assumes < 2^33 rows per partition — guaranteed by any sane
    * `maxPartitionBytes`. */
  def withGlobalPos(df: DataFrame, numPartitions: Int,
      order: Seq[Column], posCol: String = "global_pos"): DataFrame = {
    require(order.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id().cast("long"))
      .withColumn("_local",
        monotonically_increasing_id() - shiftleft(col("_pid"), 33))
      .cache()
    val sizes = Lineage.record(ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)]).collect().sortBy(_._1)
    val offsets = sizes.map(_._1)
      .zip(sizes.map(_._2).scanLeft(0L)(_ + _))
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    ranged.join(broadcast(offDf), "_pid")
      .withColumn(posCol, col("_local") + 1L + col("_off"))
      .drop("_pid", "_local", "_off")
  }
}
