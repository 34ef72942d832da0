package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Money.globalExact — the two-level (int64 bucket sums → decimal
  * sum-of-group-sums) form for single-global-group totals past the
  * 2⁵³ double bound, at synthetic 10¹²-dollar magnitudes.
  */
class MoneySpec extends SparkSpec {
  import spark.implicits._

  private def total(rows: Seq[Long], buckets: Int = 32): BigInt = {
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e4")
    val out = Money.globalExact(df, col("id"),
      Seq("t" -> sum(col("e4"))), buckets = buckets).head()
    BigInt(out.getDecimal(0).toBigInteger)
  }

  test("two-level total is exact where the double-carried sum loses cents") {
    // 2⁵³ + 1 exceeds double precision: a double carrying this total
    // rounds to 2⁵³ (the class the Money contract documents)
    val rows = Seq(1L << 53, 1L)
    assert(total(rows) == BigInt(1L << 53) + 1)
    assert(((1L << 53) + 1L).toDouble == (1L << 53).toDouble,
      "precondition: the magnitude must actually exceed double precision")
  }

  test("exact at synthetic 10¹²-dollar magnitudes, any bucket count") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
    // per-row e4 values up to 10¹⁵ (10¹¹ dollars): a handful of rows
    // pushes the total past 2⁵³ ≈ 9·10¹⁵ e4-units (~10¹² dollars)
    val rowsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1_000_000_000_000_000L))
    val bucketsGen = Gen.oneOf(1, 2, 32, 1 << 10)
    val prop = Prop.forAll(rowsGen, bucketsGen) { (rows, buckets) =>
      total(rows, buckets) == rows.map(BigInt(_)).sum
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("multiple measures aggregate independently in one pass") {
    val df = Seq((1L, 10L, 2L), (2L, 20L, 3L), (3L, 30L, 4L))
      .toDF("id", "a", "b")
    val out = Money.globalExact(df, col("id"),
      Seq("sa" -> sum(col("a")), "sb" -> sum(col("b")),
        "n" -> count(lit(1))), buckets = 4).head()
    assert(BigInt(out.getDecimal(0).toBigInteger) == 60)
    assert(BigInt(out.getDecimal(1).toBigInteger) == 9)
    assert(BigInt(out.getDecimal(2).toBigInteger) == 3)
  }

  test("empty input yields exact decimal zero, not NULL") {
    // level 1 over an empty frame produces zero bucket rows; level 2's
    // sums would be NULL where the oracle's CAST(count(*) AS DECIMAL)
    // is 0 — the coalesce pins the empty-relation result
    val empty = Seq.empty[(Long, Long)].toDF("id", "e4")
    val out = Money.globalExact(empty, col("id"),
      Seq("t" -> sum(col("e4")), "n" -> count(lit(1)))).head()
    assert(!out.isNullAt(0) && !out.isNullAt(1))
    assert(BigInt(out.getDecimal(0).toBigInteger) == 0)
    assert(BigInt(out.getDecimal(1).toBigInteger) == 0)
  }
}
