package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** KMV (k-minimum-values / bottom-k theta) distinct sketch — the
  * sketch family's SET-OPERATION member: where HLL answers "how many
  * distinct" for one set, KMV synopses COMPOSE — the union synopsis is
  * the bottom-k of merged synopses, and intersection estimates follow
  * by inclusion–exclusion. At 100 TB this is the only way to answer
  * "how many NEW users does corpus B add to A" without an exact
  * distinct-union shuffle.
  *
  * Estimator: with u = normalized 60-bit md5 hash (uniform on [0,1))
  * and h(k) the k-th smallest distinct hash, D̂ = (k−1)/h(k); when the
  * support has fewer than k values the synopsis IS the distinct set
  * and the count is exact. Standard error ≈ 1/√(k−2) (Bar-Yossef et
  * al. 2002; Beyer et al. 2007).
  *
  * Determinism: the hash is md5-derived (the cross-engine hash), the
  * synopsis is an order statistic — no RNG anywhere — so unlike HLL
  * the whole estimate is ORACLE-CHECKABLE: DuckDB computes the
  * identical bottom-k and the identical estimate.
  *
  * Scale shape: distinct-by-hash (map-side combine) → bottom-k
  * (TakeOrdered: O(k) state per partition, no full sort, no shuffle
  * beyond k rows per partition). Synopses are k doubles of bounded
  * model state.
  */
object Kmv {

  /** Normalized [0,1) 60-bit hash of a column (exact power-of-two
    * division — identical doubles in any engine). */
  def normHash(c: Column): Column =
    TextFunctions.hash60(c.cast("string")).cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Synopsis of a one-column frame of normalized hashes: the ≤ k
    * smallest distinct values (ascending). */
  def synopsis(hashes: DataFrame, k: Int): DataFrame =
    hashes.toDF("u").distinct().orderBy(col("u")).limit(k)

  /** (support size ≤ k, k-th smallest hash) — the estimator inputs. */
  def stats(syn: DataFrame, k: Int): (Long, Double) = {
    val row = syn.agg(count(lit(1)), max(col("u"))).head()
    (row.getLong(0), if (row.isNullAt(1)) 1.0 else row.getDouble(1))
  }

  /** D̂ from a synopsis: exact when the support fits the sketch. */
  def estimate(supportSize: Long, hk: Double, k: Int): Double =
    if (supportSize < k) supportSize.toDouble else (k - 1).toDouble / hk

  /** Distinct-cardinality estimate of one column. */
  def distinctEstimate(df: DataFrame, c: Column, k: Int): Double = {
    val (n, hk) = stats(synopsis(df.select(normHash(c)), k), k)
    estimate(n, hk, k)
  }

  /** Union estimate from two synopses: bottom-k of the merged
    * synopses IS the union's synopsis (the KMV composition law). */
  def unionEstimate(synA: DataFrame, synB: DataFrame, k: Int): Double = {
    val (n, hk) = stats(synopsis(synA.unionByName(synB), k), k)
    estimate(n, hk, k)
  }
}
