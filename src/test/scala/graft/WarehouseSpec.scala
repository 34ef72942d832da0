package graft

import org.apache.spark.sql.functions._
import graft.queries.WarehouseQueries

/** Plan pins + invariants for the TPC-H warehouse tier (q131–q147).
  * Correctness is the DuckDB oracle's job; these pin the SCALE-critical
  * plan shapes — subquery decorrelation to semi/anti hash joins (never
  * a per-row re-execution or a nested-loop join on a fact table),
  * broadcast dimensions, TakeOrderedAndProject top-k — and a few
  * semantic invariants the oracle can't phrase (outer-join row
  * preservation, threshold containment). */
class WarehouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q131 (Q3): top-k is TakeOrderedAndProject; segment filter pushed to scan") {
    val plan = formatted(WarehouseQueries.q131TpchQ3(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q132 (Q4): correlated EXISTS decorrelates to a semi hash join") {
    val plan = formatted(WarehouseQueries.q132TpchQ4(spark, sf))
    assert(plan.contains("LeftSemi"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q146 (Q21): EXISTS + NOT EXISTS become semi + anti hash joins on the orderkey") {
    val plan = formatted(WarehouseQueries.q146TpchQ21(spark, sf))
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q143 (Q17): correlated scalar subquery decorrelates to an aggregate join") {
    val plan = formatted(WarehouseQueries.q143TpchQ17(spark, sf))
    // per-part average is ONE grouped aggregation joined back, not a
    // re-executed subquery: no nested-loop, and a HashAggregate over
    // l_partkey feeds a hash join
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("HashAggregate"))
  }

  test("q133 (Q5): no cartesian/nested-loop; dimensions broadcast") {
    val plan = formatted(WarehouseQueries.q133TpchQ5(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4)
  }

  test("q140 (Q13): outer join preserves zero-order customers; distribution reconciles") {
    val custCount = Tables.load(spark, sf, "customer").count()
    val dist = WarehouseQueries.q140TpchQ13(spark, sf).collect()
    assert(dist.map(_.getLong(1)).sum == custCount)
  }

  test("q144 (Q18): every reported order exceeds the 300-unit threshold") {
    val rows = WarehouseQueries.q144TpchQ18(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(5) > 300.0))
  }

  test("q136 (Q8): market share is a fraction of total volume") {
    val rows = WarehouseQueries.q136TpchQ8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0.0 && nat <= tot)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q145 (Q19): disjunctive predicate still drives an equi hash join on partkey") {
    val plan = formatted(WarehouseQueries.q145TpchQ19(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
