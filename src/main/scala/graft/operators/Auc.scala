package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC (Mann–Whitney U form) with MIDRANK tie handling —
  * the classifier-ranking metric that is usually approximated at
  * scale because it needs a global rank over all scores. Here it is
  * exact and never single-reducer:
  *
  *   AUC = (Σ_{positives} midrank − n⁺(n⁺+1)/2) / (n⁺ · n⁻)
  *
  *  - compress to one row per DISTINCT score with (count, positives)
  *    — grouped, map-side combined; ties collapse here, which is what
  *    makes midranks cheap;
  *  - global cumulative count over ascending scores via the range-
  *    partition + driver-carried exclusive-prefix scheme (GlobalOrder
  *    / ksDrift / Skyline — numPartitions longs of driver state,
  *    balanced per-range windows, no Exchange SinglePartition);
  *  - the tie group ending at cumulative position e with c members
  *    has midrank (e−c) + (c+1)/2; the fractional half is avoided by
  *    carrying 2·midrank = 2(e−c) + c + 1 — ALL rank arithmetic is
  *    integer, so the result is exact and bit-identical on any
  *    engine/partitioning, with one final double division.
  *
  * Degenerate inputs (no positives or no negatives) return NULL auc —
  * the ranking is undefined, and a silent 0.0/1.0 would read as a
  * (terrible/perfect) model.
  */
object Auc {

  /** One row: (n_pos, n_neg, auc). `labelCol` must be 0/1 (numeric);
    * null scores/labels are dropped. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
      numPartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("_s"))
      .agg(count(lit(1)).as("_c"),
        sum(col(labelCol).cast("long")).as("_pos"))
    val ranged = g.repartitionByRange(numPartitions, col("_s"))
      .withColumn("_pid", spark_partition_id().cast("long"))
      .cache()
    val parts = ranged.groupBy(col("_pid")).agg(sum(col("_c")).as("_n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offs = parts.map(_._1).zip(parts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = offs.toSeq.toDF("_pid", "_off")
    val win = Window.partitionBy(col("_pid")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = ranged.join(broadcast(offDf), "_pid")
      .withColumn("_e", sum(col("_c")).over(win) + col("_off"))
      // 2·midrank of the tie group: 2(e−c) + c + 1, integer-exact
      .withColumn("_mr2", lit(2) * (col("_e") - col("_c")) + col("_c") + 1)
      .agg(sum(col("_pos")).as("np"),
        sum(col("_c") - col("_pos")).as("nn"),
        sum(col("_pos") * col("_mr2")).as("s2"))
    sums.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      when(col("np") > 0 && col("nn") > 0,
        Num.r((col("s2") - col("np") * (col("np") + 1)).cast("double") /
          (lit(2.0) * col("np") * col("nn")), 6)).as("auc"))
  }
}
