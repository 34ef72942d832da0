package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Ridge

/** Streaming twin of q187's ridge trainer: the Gram/moment sufficient
  * sums are plain integer SUM/COUNT aggregates, so Spark's update-mode
  * streaming aggregation maintains them incrementally — the state IS
  * the model's sufficient statistics (9 longs per group), and because
  * the sums are additive a counter-upsert sink (MetricsSink's ON
  * CONFLICT ADD contract) needs no further state. The closed-form
  * solve runs on any snapshot of the maintained sums — a bounded
  * (groups × 10) frame — producing the SAME coefficients the batch
  * trainer would on all data seen so far (property: integer sums are
  * order- and batching-independent; pinned against the batch solve in
  * StreamRidgeSpec).
  *
  * 100 TB notes: the only shuffle is the keyed aggregation with
  * map-side partials; state is O(groups), not O(rows); the model
  * "training" never revisits a row — exactly the one-pass contract of
  * the batch normal-equations form.
  */
object StreamRidge {

  /** Streaming (g, x1, x2, y) rows → update-mode sufficient-sums
    * aggregation (one row per group per trigger, latest wins). */
  def sufficientSums(rows: DataFrame): DataFrame =
    rows.groupBy(rows.col("g")).agg(Ridge.sumExprs.head, Ridge.sumExprs.tail: _*)

  /** Solve a (batch) snapshot of the maintained sums — e.g. the
    * upserted sink table, or the latest row per key of an update-mode
    * memory sink. */
  def solveSnapshot(sums: DataFrame, lambda: Double = Ridge.Lambda): DataFrame =
    Ridge.solve(sums, lambda)
}
