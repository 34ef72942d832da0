package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Scale-safe global scalars: attach whole-frame aggregates to every
  * row via a one-row broadcast cross join instead of
  * `agg(...).over(Window.partitionBy())` — the empty window frame
  * plans as Exchange SinglePartition and funnels the DATA rows
  * through one reducer, where the aggregate form funnels only one
  * partial row per task (the benign scalar-merge shape) and the
  * unconditioned cross join broadcasts exactly one row.
  *
  * The aggregate re-evaluates `df`'s lineage a second time, so
  * callers whose `df` hangs below an expensive scan must cache the
  * (bounded, post-aggregation) frame first — the per-source /
  * per-lang mix tables this was built for are |domain| rows.
  */
object Scalars {

  /** `df` plus one column per `(name, agg)` holding the global
    * aggregate value on every row. */
  def withScalars(df: DataFrame, aggs: (String, Column)*): DataFrame = {
    require(aggs.nonEmpty)
    val one = df.agg(aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*)
    df.crossJoin(broadcast(one))
  }
}
