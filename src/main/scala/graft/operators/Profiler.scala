package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling — the QC step a pipeline runs before
  * trusting a new drop of data: per column, non-null/null counts,
  * exact distinct cardinality, and min/max (numeric, timestamp, and
  * lexicographic string forms kept in separate typed columns so the
  * output schema is stable).
  *
  * 100 TB notes: ONE aggregation job for all columns — the naive
  * per-column loop scans the table N times. The exact countDistincts
  * plan through Catalyst's Expand (one scan, ×cols shuffle mass);
  * at extreme scale swap `exactDistinct = false` to HLL
  * (approx_count_distinct) and the whole profile becomes a plain
  * one-pass algebraic aggregate.
  */
object Profiler {

  sealed trait Kind
  case object KNum extends Kind
  case object KStr extends Kind
  case object KTs extends Kind

  final case class ColSpec(name: String, kind: Kind)

  def profile(df: DataFrame, cols: Seq[ColSpec],
      exactDistinct: Boolean = true): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { cs =>
      val c = col(cs.name)
      // numeric view of the column for min/max: timestamps → epoch
      // seconds (cross-engine stable), strings → null
      val numView: Column = cs.kind match {
        case KNum => c.cast("double")
        case KTs => unix_timestamp(c).cast("double")
        case KStr => lit(null).cast("double")
      }
      val strView: Column = cs.kind match {
        case KStr => c
        case _ => lit(null).cast("string")
      }
      val dist =
        if (exactDistinct) countDistinct(c) else approx_count_distinct(c)
      Seq(
        count(c).as(s"${cs.name}__n"),
        count(when(c.isNull, 1)).as(s"${cs.name}__nulls"),
        dist.as(s"${cs.name}__distinct"),
        min(numView).as(s"${cs.name}__min_num"),
        max(numView).as(s"${cs.name}__max_num"),
        min(strView).as(s"${cs.name}__min_str"),
        max(strView).as(s"${cs.name}__max_str"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    unpivot(row, cols)
  }

  private def unpivot(row: DataFrame, cols: Seq[ColSpec]): DataFrame = {
    // Unpivot the single stats row via ONE explode-of-structs
    // projection. (A union of per-column projections re-plans the
    // whole aggregation once per branch — N scans of the table; the
    // plan audit caught exactly that.)
    val entries = array(cols.map { cs =>
      struct(
        lit(cs.name).as("col_name"),
        col(s"${cs.name}__n").as("n"),
        col(s"${cs.name}__nulls").as("nulls"),
        col(s"${cs.name}__distinct").as("n_distinct"),
        col(s"${cs.name}__min_num").as("min_num"),
        col(s"${cs.name}__max_num").as("max_num"),
        col(s"${cs.name}__min_str").as("min_str"),
        col(s"${cs.name}__max_str").as("max_str"))
    }: _*)
    row.select(explode(entries).as("s")).select(col("s.*"))
  }

  /** Fixed-width histogram of a numeric column, optionally per group:
    * bucket = min(⌊x / width⌋, maxBucket) — explicit floor arithmetic,
    * not width_bucket(), so the bucket edges are identical IEEE
    * operations in any engine. One aggregation; empty buckets are
    * absent (sparse form — at 100 TB a dense grid would be a driver
    * materialization).
    */
  def histogram(df: DataFrame, valueCol: String, width: Double,
      maxBucket: Int, groupCols: Seq[String] = Nil): DataFrame = {
    val bucket = least(floor(col(valueCol) / width), lit(maxBucket))
      .cast("long").as("bucket")
    val keys = groupCols.map(col) :+ col("bucket")
    df.select(groupCols.map(col) :+ bucket: _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(keys: _*)
  }
}
