package graft

import org.apache.spark.sql.functions._

/** Regression goldens for the queries with no DuckDB oracle. Only the
  * two queries built on Spark-INTERNAL sketches remain: q19
  * (approx_count_distinct = Spark's HLL++ register layout) and q37b
  * (approx quantiles = Spark's KLL/GK sketch) — their results depend
  * on sketch internals no external engine reproduces, so a pinned
  * value-hash at sf0.01 catches silent regressions the rows-only
  * driver check would miss. Both ARE deterministic for fixed input.
  * (q29 LSH-ANN, q29b IVF-ANN, and q68 PQ-ADC graduated to full
  * DuckDB oracles in round 8 — their pins are retired.)
  *
  * The pin is (row count, bit_xor of per-row xxhash64, decimal SUM of
  * the same hashes): xor alone is blind to multiplicity changes that
  * preserve parity (a bug triplicating every row satisfies
  * h⊕h⊕h = h), so the order-independent sum rides along — a
  * multiplicity change that fools xor, count AND sum simultaneously
  * is not a plausible regression.
  *
  * If an INTENTIONAL change to one of these operators shifts a pin,
  * re-pin it here and say why in the commit message. */
class GoldenHashSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  private val goldens = Map(
    "q19_approx_distinct" ->
      (5L, -7087515408835177624L, BigDecimal("-4556082857057981218")),
    "q37b_approx_quantiles" ->
      (3L, 8345016534504703741L, BigDecimal("5689306019265833249")))

  for ((name, (en, ex, es)) <- goldens.toSeq.sortBy(_._1))
    test(s"golden hash pins $name at sf0.01") {
      val d = SparkEntry.queries(name)(spark, sf01)
      val (n, x, s) = d
        .select(xxhash64(d.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)"),
          sum(col("h").cast("decimal(38,0)")))
        .as[(Long, Long, BigDecimal)].head()
      assert((n, x, s) == ((en, ex, es)),
        s"$name output drifted: got ($n, ${x}L, $s)")
    }
}
