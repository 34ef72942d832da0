package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** Property-fuzz for the oracle-SQL emitters (round-11 verdict #5):
  * the q177 precedence bug and the r10 HUGEINT wave were both
  * emitter-class bugs caught late, at the full-sweep stage.
  *
  * This spec generates random expression TREES that embed emitted
  * fragments as operands of surrounding operators — the exact context
  * where a missing parenthesis re-associates — renders them through
  * [[Num.sqlR]], and evaluates the rendered SQL text through Spark's
  * OWN SQL parser against the Column composition. The floor-arithmetic
  * subset `sqlR` emits is dialect-shared, so Spark's parser applies
  * the same precedence rules DuckDB would; a fragment that
  * re-associates under one parser re-associates under both.
  *
  * The DuckDB-dialect emitters (TF.sql*) can't be parsed by Spark —
  * their cross-engine leg is `runMain graft.EmitterFuzz` +
  * `tools/check.py` (value + arrow-type audit over real documents),
  * recorded in BASELINE.md.
  */
class EmitterFuzzSpec extends SparkSpec {

  /** A generated tree: the Column form and the emitted SQL text,
    * built in lockstep. */
  private case class Tree(col: Column, sql: String)

  private val leafGen: Gen[Tree] = Gen.oneOf(
    // CAST(... AS DOUBLE): a bare `7.0` parses as DECIMAL in SQL text
    // (Spark and DuckDB both) while lit(7.0) is DOUBLE — leaf typing
    // must match or decimal arithmetic drifts from the binary doubles
    Gen.oneOf(Seq(0.125, 1.0, 2.35, 21.675, 100.005, 7.0)).map(d =>
      Tree(lit(d), s"CAST($d AS DOUBLE)")),
    Gen.const(Tree(col("v"), "v")))

  /** Trees where every emitted sqlR fragment lands as an operand of a
    * surrounding +,-,*,/ — mis-associating contexts. Divisors are
    * guarded away from zero on BOTH sides identically. */
  private def treeGen(depth: Int): Gen[Tree] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      2 -> (for {
        a <- treeGen(depth - 1); b <- treeGen(depth - 1)
        op <- Gen.oneOf("+", "-", "*")
      } yield Tree(
        op match {
          case "+" => a.col + b.col
          case "-" => a.col - b.col
          case _ => a.col * b.col
        },
        // the HARNESS parenthesizes its own compositions (the Column
        // tree is structural; flat text would re-associate) — what's
        // under test is the parenthesization INSIDE emitted fragments
        s"(${a.sql} $op ${b.sql})")),
      2 -> (for { a <- treeGen(depth - 1); b <- treeGen(depth - 1) } yield
        // guarded division: |b| + 1 is never 0 — SAME guard in both forms
        Tree(a.col / (abs(b.col) + lit(1.0)),
          s"(${a.sql} / (abs(${b.sql}) + 1.0))")),
      3 -> (for {
        a <- treeGen(depth - 1); scale <- Gen.oneOf(2, 4)
      } yield Tree(Num.r(a.col, scale), Num.sqlR(a.sql, scale))))

  private val caseGen: Gen[(Tree, Double)] = for {
    t <- treeGen(3)
    v <- Gen.oneOf(-3.125, 0.0, 0.005, 1.0, 2.345, 99.995, 1234.5)
  } yield (t, v)

  private def evalBoth(t: Tree, v: Double): (Double, Double) = {
    import spark.implicits._
    val df = Seq(v).toDF("v")
    val fromCol = df.select(t.col.cast("double").as("x")).head().getDouble(0)
    val fromSql = df.select(expr(t.sql).cast("double").as("x")).head().getDouble(0)
    (fromCol, fromSql)
  }

  test("Num.sqlR: random trees round-trip through the SQL parser bit-equal") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60),
      Prop.forAll(caseGen) { case (t, v) =>
        val (a, b) = evalBoth(t, v)
        (a.isNaN && b.isNaN) || a == b
      })
    assert(res.passed, res.status.toString)
  }

  test("the fuzz catches a deliberately unparenthesized probe emitter") {
    // the pre-q177-fix form: ends in `/ f` with NO outer parens, so an
    // enclosing division re-associates (x / floor(...) / f)
    def sqlRBad(e: String, scale: Int): String = {
      val p = math.pow(10, scale + 4).toLong
      val f = math.pow(10, scale).toLong
      s"floor((floor(($e) * $p + 0.5) / $p) * $f + 0.5) / $f"
    }
    import spark.implicits._
    val df = Seq(2.35).toDF("v")
    val good = df.select(
      (lit(10.0) / Num.r(col("v"), 2) / lit(2.0)).as("x")).head().getDouble(0)
    val bad = df.select(
      expr(s"10.0 / ${sqlRBad("v", 2)} / 2.0").cast("double").as("x"))
      .head().getDouble(0)
    val fixed = df.select(
      expr(s"10.0 / ${Num.sqlR("v", 2)} / 2.0").cast("double").as("x"))
      .head().getDouble(0)
    assert(fixed == good, s"parenthesized emitter drifted: $fixed vs $good")
    assert(bad != good,
      "probe emitter was NOT caught — the precedence fuzz is vacuous")
  }
}
