package graft.operators

import org.apache.spark.sql.Column
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
}
