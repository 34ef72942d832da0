package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scalars.withScalars — the scalar-agg + one-row broadcast cross
  * replacement for empty-frame windows (`sum(...).over
  * (Window.partitionBy())`), which plan as Exchange SinglePartition
  * over the data rows. */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(("a", 4L), ("b", 6L), ("c", 10L)).toDF("k", "n")

  test("values equal the empty-frame window form") {
    val viaWindow = df
      .withColumn("tot", sum($"n").over(Window.partitionBy()))
      .withColumn("frac", $"n" / $"tot")
      .select($"k", $"tot", $"frac")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val viaScalars = Scalars.withScalars(df, "tot" -> sum($"n"))
      .withColumn("frac", $"n" / $"tot")
      .select($"k", $"tot", $"frac")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaScalars == viaWindow)
  }

  test("plan carries no SinglePartition exchange over non-scalar data") {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case _ => p +: p.children.flatMap(walk)
    }
    val out = Scalars.withScalars(df, "tot" -> sum($"n"), "c" -> count(lit(1)))
    out.collect() // materialize AQE stages
    val funnels = walk(out.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        e
    }
    // the only SinglePartition shuffles allowed are scalar merges
    // (empty grouping) — the exact test PlanGate applies
    funnels.foreach { e =>
      assert(graft.PlanGate.isScalarMerge(e.child),
        s"non-scalar SinglePartition funnel: ${e.child.nodeName}")
    }
    assert(out.columns.toSeq == Seq("k", "n", "tot", "c"))
  }

  test("multiple aggregates land in one scalar row") {
    val r = Scalars.withScalars(df,
      "tot" -> sum($"n"), "mx" -> max($"n"), "cnt" -> count(lit(1)))
      .select($"tot", $"mx", $"cnt").distinct()
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((20L, 10L, 3L)))
  }
}
