package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** SortedIntersectCount must agree exactly with the built-in
  * size(array_intersect(a, b)) on sorted distinct arrays — that
  * built-in form is what the PPJoin verification used before, so any
  * drift silently corrupts q86's exactness. */
class SetExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("string merge-intersect matches array_intersect on 500 random set pairs") {
    val rows = (0 until 500).map { _ =>
      val a = (0 until rnd.nextInt(40)).map(_ => s"tok_${rnd.nextInt(60)}").distinct.sorted
      val b = (0 until rnd.nextInt(40)).map(_ => s"tok_${rnd.nextInt(60)}").distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").cache()
    val bad = df.filter(
      SetFunctions.sorted_intersect_count(col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b"))))
    assert(bad.isEmpty)
  }

  test("long merge-intersect matches array_intersect, incl. empty and disjoint") {
    val rows = (0 until 500).map { _ =>
      val a = (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      val b = (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(50).toLong).distinct.sorted
      (a, b)
    } ++ Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L), Seq.empty[Long]),
      (Seq(1L, 3L), Seq(2L, 4L)), (Seq(5L, 6L, 7L), Seq(5L, 6L, 7L)))
    val df = rows.toDF("a", "b").cache()
    val bad = df.filter(
      SetFunctions.sorted_intersect_count(col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b"))))
    assert(bad.isEmpty)
  }

  test("null ELEMENTS are skipped, not NPE'd, in interpreted and codegen paths") {
    // the function is SQL-registered, so arbitrary containsNull=true
    // arrays can reach it; sort_array puts nulls first ascending
    val df = Seq(
      (Seq[Option[String]](None, Some("a"), Some("b")),
        Seq[Option[String]](Some("a"), Some("c"))),
      (Seq[Option[String]](Some("a"), Some("b")),
        Seq[Option[String]](None, None, Some("b"))),
      (Seq[Option[String]](None), Seq[Option[String]](None))
    ).toDF("a", "b")
    // codegen path (DataFrame expression)
    val got = df.select(
      SetFunctions.sorted_intersect_count(col("a"), col("b")).as("c"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 1, 0))
    // interpreted path: force eval through a literal in spark.sql
    SetFunctions.register(spark)
    val one = spark.sql(
      "SELECT sorted_intersect_count(array(NULL, 'a', 'b'), array('b', NULL))")
      .as[Int].head()
    assert(one == 1)
  }

  test("SQL registration works for every custom scalar (r6: 'builtin' " +
    "was rejected by Spark 4's source whitelist, latent until called)") {
    SetFunctions.register(spark)
    VectorFunctions.register(spark)
    assert(spark.sql("SELECT sorted_intersect_count(array('x'), array('x'))")
      .as[Int].head() == 1)
    assert(spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .as[Double].head() == 11.0)
  }

  test("null propagates and codegen path is active") {
    val df = Seq((Some(Seq("x")), Seq("x")), (None, Seq("x")))
      .toDF("a", "b")
    val got = df.select(
      SetFunctions.sorted_intersect_count(col("a"), col("b")).as("c")).collect()
    assert(got.count(_.isNullAt(0)) == 1)
    // a parquet-backed plan (local relations are folded eagerly)
    val scan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(split(col("text"), " ").as("t"))
      .select(SetFunctions.sorted_intersect_count(col("t"), col("t")))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(scan.queryExecution.executedPlan.toString.contains("sortedintersectcount"))
    assert(scan.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
