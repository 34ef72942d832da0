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

  /** Add `posCol` (1-based global rank under `order`) to `df`. */
  def withGlobalPos(df: DataFrame, numPartitions: Int,
      order: Seq[Column], posCol: String = "global_pos"): DataFrame = {
    require(order.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(numPartitions, order: _*)
      .withColumn("_pid", spark_partition_id())
      .cache()
    val sizes = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = sizes.map(_._1)
      .zip(sizes.map(_._2).scanLeft(0L)(_ + _))
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    ranged.join(broadcast(offDf), "_pid")
      .withColumn(posCol, row_number().over(w).cast("long") + col("_off"))
      .drop("_pid", "_off")
  }
}
