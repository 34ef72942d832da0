package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Lineage truncation with plan-gate visibility.
  *
  * Iterative operators (connected components, PageRank, BPE, the MMR
  * greedy fold, …) truncate lineage at reuse points: the truncated
  * frame is read several times downstream, and an untruncated plan
  * would re-execute the expensive upstream once per reference —
  * exponentially for per-round folds. They call [[cut]] instead of
  * `DataFrame.localCheckpoint()` directly; in normal runs the two are
  * identical (an eager executor-local materialization).
  *
  * The plan-gate problem `cut` solves: a checkpoint replaces its
  * upstream subplan with an RDD scan in every downstream
  * `executedPlan`, so a static plan walk ([[graft.PlanGate]], the plan
  * specs) cannot see anti-patterns upstream of a checkpoint — a
  * BroadcastNestedLoopJoin edge generator would hide behind the very
  * checkpoint that materialized it (round-11 ADVICE). While a walk
  * runs inside [[capturing]], every `cut` ALSO records the
  * pre-checkpoint physical plan (compiled, not executed — the compile
  * is cheap) into a thread-local buffer the walker then gates.
  *
  * What still executes during a "static" walk: the checkpoint itself,
  * plus any bounded driver-side model fitting in the construction path
  * (BPE argmax, k-means centroids). Construction can never be fully
  * lazy for those; the gate therefore runs at sf0.001, where the
  * eager work is milliseconds per query.
  */
object Lineage {
  private val buf = new ThreadLocal[mutable.Buffer[SparkPlan]]

  /** Record `df`'s physical plan into an active [[capturing]] walk
    * WITHOUT materializing — for construction-time bounded collects
    * (the mix-plan fit, model training) whose upstream corpus-scale
    * stage would otherwise vanish from every downstream
    * `executedPlan` and escape the gate entirely. */
  def record[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val b = buf.get()
    if (b != null) {
      // capture must never fail a run — but only for non-fatal compile
      // errors: swallowing OutOfMemoryError/InterruptedException here
      // would mask a dying JVM and clear the interrupt flag (r16 advice)
      try b += ds.queryExecution.executedPlan
      catch { case scala.util.control.NonFatal(_) => () }
    }
    ds
  }

  /** Truncate lineage (`localCheckpoint`), recording the
    * pre-checkpoint physical plan when a [[capturing]] walk is active
    * on this thread. */
  def cut(df: DataFrame): DataFrame = {
    record(df)
    df.localCheckpoint()
  }

  /** Enrichment so call sites read like the method they replace:
    * `frame.cutLineage()` ≡ `Lineage.cut(frame)`. */
  implicit class LineageOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }

  /** Run `body` (query construction) while recording every [[cut]]'s
    * pre-checkpoint physical plan; returns (result, recorded plans).
    * Single-thread scope — construction-time Spark jobs may run on
    * other threads, but `cut` itself is always called on the
    * constructing thread. */
  def capturing[T](body: => T): (T, Seq[SparkPlan]) = {
    val b = mutable.Buffer.empty[SparkPlan]
    buf.set(b)
    try {
      val r = body
      (r, b.toSeq)
    } finally buf.remove()
  }
}
