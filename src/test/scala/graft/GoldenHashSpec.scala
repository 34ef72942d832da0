package graft

import org.apache.spark.sql.functions._

/** Regression goldens for the five queries with no DuckDB oracle
  * (approximate/sketch ops: HLL, LSH-ANN, IVF-ANN, KLL, PQ-ADC).
  * Their outputs ARE deterministic for fixed input — every source of
  * "randomness" is an md5/xxhash of the data itself — so a pinned
  * value-hash at sf0.01 catches silent regressions the rows-only
  * driver check would miss. The hash is order-independent (bit_xor
  * fold of per-row xxhash64 over all columns), matching the driver's
  * and Bench's materialization convention.
  *
  * If an INTENTIONAL change to one of these operators shifts a hash,
  * re-pin it here and say why in the commit message. */
class GoldenHashSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  private val goldens = Map(
    "q19_approx_distinct" -> -7087515408835177624L,
    "q29_ann_lsh" -> -5247240000319932891L,
    "q29b_ann_ivf" -> -1298353714317060049L,
    "q37b_approx_quantiles" -> 8345016534504703741L,
    "q68_pq_adc" -> 6339376206052989512L)

  for ((name, expected) <- goldens.toSeq.sortBy(_._1))
    test(s"golden hash pins $name at sf0.01") {
      val d = SparkEntry.queries(name)(spark, sf01)
      val h = d.select(xxhash64(d.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head()
      assert(h == expected, s"$name output hash drifted: got ${h}L")
    }
}
