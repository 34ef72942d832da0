package graft.operators

import org.apache.spark.sql.DataFrame
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
    * null scores/labels are dropped. Rank machinery is the shared
    * [[Ranks.midranks2]] (doubled midranks ⇒ integer-exact). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
      numPartitions: Int = 8): DataFrame = {
    val sums = Ranks.midranks2(
      df.filter(col(labelCol).isNotNull)
        .select(col(scoreCol).cast("double").as("s"),
          col(labelCol).cast("long").as("y")),
      "s", Seq(sum(col("y")).as("_pos")), numPartitions)
      .agg(sum(col("_pos")).as("np"),
        sum(col("c") - col("_pos")).as("nn"),
        sum(col("_pos") * col("mr2")).as("s2"))
    sums.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      when(col("np") > 0 && col("nn") > 0,
        Num.r((col("s2") - col("np") * (col("np") + 1)).cast("double") /
          (lit(2.0) * col("np") * col("nn")), 6)).as("auc"))
  }
}
