package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with the
  * same key and timestamp ≤ the left's, optionally within a tolerance.
  * Spark has no native as-of join; a sorted-merge doesn't map directly
  * to a shuffle engine, so this uses the standard union +
  * last-non-null-over-window technique: one shuffle on the key, one
  * per-partition sort — the cost of a sort-merge join, with no row
  * explosion (compare the naive `left join right on t_r <= t_l` which
  * multiplies rows before re-aggregating).
  *
  * 100 TB: partitions by key; hot keys cost only their per-key sort.
  * The window carries one value per column — nothing accumulates.
  */
object AsOfJoin {

  /** @param leftCols  left payload columns carried through unchanged
    * @param rightCols right payload columns emitted as `asof_<c>`
    * @param toleranceSec match only if left.ts - right.ts ≤ tolerance */
  def asOf(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      leftCols: Seq[String], rightCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val l = leftDf.select(
      Seq(col(keyCol).as("k"), col(leftTs).as("t"), lit(1).as("side"),
        lit(null).cast("timestamp").as("r_ts")) ++
        leftCols.map(c => col(c).as(s"l_$c")) ++
        rightCols.map(c => lit(null).cast(rightDf.schema(c).dataType)
          .as(s"r_$c")): _*)
    val r = rightDf.select(
      Seq(col(keyCol).as("k"), col(rightTs).as("t"), lit(0).as("side"),
        col(rightTs).as("r_ts")) ++
        leftCols.map(c => lit(null).cast(leftDf.schema(c).dataType)
          .as(s"l_$c")) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)

    // Within each key, ordered by (t, side) — right rows sort before
    // left rows at equal timestamps — the last non-null right value so
    // far IS the as-of match.
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = ("r_ts" +: rightCols.map(c => s"r_$c")).foldLeft(l.unionByName(r)) {
      (df, c) => df.withColumn(s"${c}_f", last(col(c), ignoreNulls = true).over(w))
    }
    val lefts = carried.filter(col("side") === 1)
    val matched = toleranceSec match {
      case Some(tol) =>
        val keep = col("r_ts_f").isNotNull &&
          unix_timestamp(col("t")) - unix_timestamp(col("r_ts_f")) <= tol
        ("r_ts" +: rightCols.map(c => s"r_$c")).foldLeft(lefts) {
          (df, c) => df.withColumn(s"${c}_f", when(keep, col(s"${c}_f")))
        }
      case None => lefts
    }
    matched.select(
      Seq(col("k").as(keyCol), col("t").as(leftTs),
        col("r_ts_f").as("asof_ts")) ++
        leftCols.map(c => col(s"l_$c").as(c)) ++
        rightCols.map(c => col(s"r_${c}_f").as(s"asof_$c")): _*)
  }

  /** Native-operator variant: plans through graft.plans.AsOfJoinPlan /
    * AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan) — one
    * hash exchange + sort per side, then a streaming forward merge with
    * O(1) state, instead of the padded union + window above. Output:
    * every left column ++ asof_ts ++ asof_<rightCols>.
    *
    * Note: tolerance compares at microsecond precision (the DataFrame
    * variant truncates to seconds via unix_timestamp). */
  def asOfNative(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = GraftColumnBridge.analyzed(leftDf)
    val rPlan0 = GraftColumnBridge.analyzed(rightDf)
    // Self-join hygiene: DeduplicateRelations only rewrites known join
    // nodes, so when both sides share a relation (same exprIds),
    // re-alias the right side to fresh ids.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlan0)
      else rPlan0
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    GraftColumnBridge.ofRows(spark, graft.plans.AsOfJoinPlan.create(
      lPlan, rPlan,
      attr(lPlan, keyCol), attr(rPlan, keyCol),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightCols.map(attr(rPlan, _)),
      toleranceSec))
  }
}
