package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine numeric helpers.
  *
  * `round(x, 2)` is NOT portable across engines on doubles: Spark
  * rounds via BigDecimal(HALF_UP on the shortest decimal string) while
  * DuckDB rounds the scaled binary value — they disagree on .xx5
  * boundaries (e.g. avg(21.35/2)). Instead we use a pure IEEE
  * expression that is bit-identical in any engine, in two stages:
  * first round to `scale+4` decimals (collapsing last-ulp differences
  * from summation order), then to `scale`. Half-ties round toward
  * +inf. SURVEY.md §7.4 risk 6.
  */
object Num {
  /** Round to `scale` decimals, identical in Spark and DuckDB. */
  def r(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale + 4)
    val f = math.pow(10, scale)
    val snapped = floor(c * p + 0.5) / p
    floor(snapped * f + 0.5) / f
  }
  def r2(c: Column): Column = r(c, 2)
  def r4(c: Column): Column = r(c, 4)

  /** JVM twin of [[r]] for driver-side model state (centroids, GD
    * weights, covariance entries) that must land bit-equal with the
    * SQL form — powers of 10 through 1e22 are exact doubles, so the
    * two-stage floor here is the identical IEEE computation. */
  def j(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale + 4)
    val f = math.pow(10, scale)
    math.floor(math.floor(x * p + 0.5) / p * f + 0.5) / f
  }

  /** Same expression as DuckDB SQL text. Emitted fully parenthesized:
    * the raw form ends in `/ $f`, so embedding it as an operand of a
    * surrounding `/` or `*` silently re-associates (q177's chi²
    * denominator read as `x / floor(...) / 1e6` and evaluated ≈ 0). */
  def sqlR(e: String, scale: Int): String = {
    val p = math.pow(10, scale + 4).toLong
    val f = math.pow(10, scale).toLong
    s"(floor((floor(($e) * $p + 0.5) / $p) * $f + 0.5) / $f)"
  }
  def sqlR2(e: String): String = sqlR(e, 2)
  def sqlR4(e: String): String = sqlR(e, 4)
}
