package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The inventory-wide plan gate (PlanGate.violations) must actually
  * catch the anti-patterns it claims to — each probe builds the bad
  * plan shape deliberately — and must stay quiet on the benign shapes
  * (scalar crossJoin, literal model-table broadcast). */
class PlanGateSpec extends SparkSpec {
  import spark.implicits._

  private def viol(name: String, df: org.apache.spark.sql.DataFrame) =
    PlanGate.violations(name, df.queryExecution.executedPlan)

  // a local Seq plans as LocalTableScan — the literal-model shape the
  // gate deliberately excuses — so data probes must be file-backed,
  // like every real table in the inventory
  private lazy val data: org.apache.spark.sql.DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("plangate").toString
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$p/d.parquet")
    spark.read.parquet(s"$p/d.parquet")
  }

  test("catches a data-vs-data theta join (BNLJ with condition)") {
    val d = data
    val bad = d.as("a").join(d.as("b"), col("a.v") < col("b.v"))
    assert(viol("probe", bad).exists(_.startsWith("BNLJ")))
  }

  test("quiet on the scalar-summary crossJoin") {
    val d = data
    val ok = d.crossJoin(broadcast(d.agg(sum(col("v")).as("tot"))))
    assert(viol("probe", ok).isEmpty)
  }

  test("quiet on a literal model-table broadcast (LocalTableScan build side)") {
    val d = data
    val model = Seq((0, 1.0), (1, 5.0)).toDF("cell", "cv")
    val ok = d.join(broadcast(model)) // every row vs every centroid
    assert(viol("probe", ok).isEmpty)
  }

  test("catches a data-bearing SinglePartition funnel; quiet on scalar merge") {
    val d = data
    val bad = d.withColumn("rn", row_number().over(Window.orderBy(col("id"))))
    assert(viol("probe", bad).exists(_.startsWith("SinglePartition")))
    val ok = d.agg(sum(col("v")).as("tot"))
    assert(viol("probe", ok).isEmpty)
  }

  test("an allowlist exemption requires its recorded condition fragment") {
    val d = data
    val theta = d.as("a").join(d.as("b"), col("a.v") < col("b.v"))
    // same plan, allowlisted name, but the condition fragment recorded
    // for q153 (levenshtein) is absent -> still a violation
    assert(viol("q153_edit_join", theta).nonEmpty)
  }
}
