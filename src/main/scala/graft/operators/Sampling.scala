package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded sampling aggregators.
  *
  * The reference samples ids with `collect_list` then `slice(_, 1, 3)`
  * (dropoff_processor.py:49,67) — at 100 TB that materializes EVERY id
  * per group in aggregation state before slicing. `BoundedMinSample`
  * keeps only the k smallest values in the buffer, so state per group
  * is O(k) regardless of group size, and the result equals
  * `slice(sort_array(collect_list(DISTINCT x)), 1, k)` exactly — which
  * is what lets the DuckDB oracle verify it (SamplingSpec).
  */
object Sampling {

  final class BoundedMinSample(k: Int)
      extends Aggregator[String, Seq[String], Seq[String]] {
    override def zero: Seq[String] = Seq.empty

    private def insert(buf: Seq[String], v: String): Seq[String] =
      if (v == null || buf.contains(v)) buf
      else ((v +: buf).sorted: Seq[String]).take(k)

    override def reduce(buf: Seq[String], v: String): Seq[String] =
      insert(buf, v)

    override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[String]): Seq[String] = buf

    override def bufferEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** Column form: the k smallest distinct values of a string column,
    * with O(k) aggregation state per group. */
  def smallestK(c: Column, k: Int): Column =
    udaf(new BoundedMinSample(k), Encoders.STRING).apply(c)

  final case class Scored(id: Long, score: Double)

  /** The (score desc, id asc) strict-weak ordering shared by
    * [[TopKByScore]] and [[Mmr.MmrGreedy]] — single-sourced so the
    * fused MMR's candidate cut can never drift from the top-m window
    * rank it must bit-match. Primitive `==` first (±0.0 tie-break by
    * id, matching Spark's compareDoubles), then `Double.compare`
    * (NaN orders greatest; NaN-vs-NaN falls to the id tie-break). */
  private[operators] def betterByScore(as: Double, ai: Long,
      bs: Double, bi: Long): Boolean =
    if (as == bs) ai < bi
    else {
      val c = java.lang.Double.compare(as, bs)
      c > 0 || (c == 0 && ai < bi)
    }

  /** Per-key top-k by (score desc, id asc) with O(k) state — the
    * bounded-aggregation alternative to `row_number().over(window)`,
    * which buffers and sorts EVERY row of a partition. Map-side partial
    * aggregation prunes to k before the shuffle, so the exchange
    * carries ≤ k rows per key per task. */
  final class TopKByScore(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    // Must match Spark's desc window rank (which this aggregator
    // replaces) on BOTH double edge classes: primitive == first so
    // -0.0 and 0.0 tie-break by id (Spark's compareDoubles treats
    // them equal; Double.compare alone would rank +0.0 above -0.0 —
    // negated scores like -adc produce -0.0), then Double.compare for
    // NaN (zero-norm cosines): NaN orders greatest, NaN-vs-NaN falls
    // through to the id tie-break. Equivalence classes {−0.0, 0.0}
    // and {NaN} keep the ordering strict-weak for sortWith.
    private def better(a: Scored, b: Scored): Boolean =
      Sampling.betterByScore(a.score, a.id, b.score, b.id)

    override def zero: Seq[Scored] = Seq.empty

    private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] = {
      val merged = (v +: buf).sortWith(better)
      if (merged.size > k) merged.take(k) else merged
    }

    override def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] =
      insert(buf, v)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: top-k (id, score) pairs per group. */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    udaf(new TopKByScore(k), ExpressionEncoder[Scored]()).apply(id, score)
}
