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
}
