package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact integer money arithmetic shared by every query that sums
  * currency at scale, with the Column and SQL forms side by side so
  * they cannot drift (the Num pattern).
  *
  * Contract: the measure columns are 2-decimal by data contract
  * (audited `x == round(x, 2)` row-exact at every SF), so
  * `floor(x·100 + 0.5)` recovers the exact cent/percent integer in
  * both engines and an int64 SUM of products cannot drift with
  * partial-aggregation order. A plain double sum snapped at r2 is
  * exposed once its magnitude passes ~10¹⁰ — one ulp (2⁻⁵² relative)
  * exceeds the r6 snap grain — measured as one-cent oracle mismatches
  * at sf1 (q136/q141) and sf10 (q1) before the conversion.
  *
  * Headroom: lineitem revenue in e4 units is ≤ 10⁵·10⁴ ≈ 10⁹ per row;
  * 2⁶³/10⁹ ≈ 9·10⁹ rows per GROUP before int64 overflow, and the
  * final cast to double is exact below 2⁵³ e4-units (≈ 9·10¹¹
  * dollars). Both bounds sit far past the 100-TB trajectory for
  * grouped sums; a single global group at ~10¹² dollars would need a
  * two-level (sum of group sums) form.
  */
object Money {

  /** 2-decimal column → exact integer hundredths (cents for money,
    * percent points for a 2-decimal fraction like l_discount). */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** SQL twin of [[cents]]. `e` must be a bare column or
    * parenthesized expression. */
  def centsSql(e: String): String =
    s"CAST(floor($e * 100 + 0.5) AS BIGINT)"

  /** lineitem revenue `l_extendedprice · (1 − l_discount)` in exact
    * e4 (10⁻⁴-dollar) units. */
  def revE4: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  val revE4Sql: String =
    s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"

  /** Two-level exact global sums for the single-global-group tail —
    * the form the contract note above reserves for totals past the
    * int64/2⁵³ single-level bounds. Level 1 sums each measure as int64
    * within hash buckets of `key` (map-side combine intact; ANSI mode
    * turns an overflowing bucket into a loud error, and bucket row
    * counts shrink 1/buckets so the 9·10⁹-rows-per-group int64 bound
    * becomes 9·10⁹·buckets rows globally); level 2 sums the bucket
    * sums as decimal(38,0) — exact at ANY total magnitude, where a
    * double carrying the same total loses cents past 2⁵³ integer
    * units. Returns one row with each measure aliased per `measures`,
    * as decimal(38,0).
    *
    * The level-2 exchange carries `buckets` rows — a scalar-merge
    * funnel, the same shape as any grand total. */
  def globalExact(df: DataFrame, key: Column,
      measures: Seq[(String, Column)], buckets: Int = 1 << 10): DataFrame = {
    require(measures.nonEmpty)
    val level1 = df
      .groupBy(pmod(xxhash64(key), lit(buckets)).as("__bucket"))
      .agg(measures.head._2.as("__m0"),
        measures.tail.zipWithIndex
          .map { case ((_, m), i) => m.as(s"__m${i + 1}") }: _*)
    // coalesce: an empty input yields zero level-1 bucket rows, so each
    // level-2 sum would be NULL where the oracle's CAST(count(*) ...)
    // is 0 — pin the empty-relation result to exact decimal zero.
    def l2(c: Column) =
      coalesce(sum(c.cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
    level1.agg(
      l2(col("__m0")).as(measures.head._1),
      measures.tail.zipWithIndex.map { case ((name, _), i) =>
        l2(col(s"__m${i + 1}")).as(name)
      }: _*)
  }

  /** SQL twin of [[globalExact]] for one measure: DuckDB's BIGINT sum
    * is HUGEINT (exact) — the cast pins the arrow type to the same
    * decimal128(38,0) the Spark side emits. COALESCE mirrors the
    * Spark side's empty-relation pin: [[globalExact]] coalesces every
    * level-2 measure to exact zero, so the oracle must too (a bare
    * sum() yields NULL on zero input rows and the engines would
    * diverge on exactly the edge the coalesce exists for). */
  def globalExactSql(sumExpr: String): String =
    s"CAST(COALESCE(sum($sumExpr), 0) AS DECIMAL(38,0))"
}
