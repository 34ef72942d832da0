package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("bounded sample equals sort_array+collect_list+slice on distinct values") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_type", $"user_id".cast("string").as("uid"))
    val viaList = ev.groupBy($"event_type")
      .agg(slice(sort_array(collect_set($"uid")), 1, 3).as("s"))
      .as[(String, Seq[String])].collect().toMap
    val viaAgg = ev.groupBy($"event_type")
      .agg(Sampling.smallestK($"uid", 3).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(viaList == viaAgg)
  }

  test("bounded sample state stays at k under heavy groups") {
    val big = spark.range(100000)
      .select(lit("g").as("g"), format_string("v%07d", $"id").as("v"))
    val out = big.groupBy($"g").agg(Sampling.smallestK($"v", 5).as("s"))
      .as[(String, Seq[String])].collect().head
    assert(out._2 == (0 until 5).map(i => f"v$i%07d"))
  }

  test("topKByScore orders NaN greatest, matching the desc window rank") {
    // zero-norm vectors yield NaN cosines; primitive > would violate
    // strict weak ordering and let sortWith place them arbitrarily
    val df = Seq(
      (1L, 0.9), (2L, Double.NaN), (3L, 0.5), (4L, Double.NaN), (5L, 0.7)
    ).toDF("id", "score")
    val viaAgg = df.groupBy(lit(1).as("g"))
      .agg(Sampling.topKByScore($"id", $"score", 3).as("t"))
      .select(explode($"t").as("s"))
      .select($"s.id").as[Long].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).orderBy($"rn")
      .select($"id").as[Long].collect().toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg == Seq(2L, 4L, 1L), "NaN first (desc), then finite desc")
  }

  test("topKByScore treats -0.0 and 0.0 as equal, matching Spark's sort") {
    // Spark's compareDoubles has -0.0 == 0.0 (id tie-break); raw
    // Double.compare would rank +0.0 above -0.0 — negated scores
    // (e.g. -adc) produce -0.0
    val df = Seq((1L, 0.0), (2L, -0.0), (3L, -1.0)).toDF("id", "score")
    val viaAgg = df.groupBy(lit(1).as("g"))
      .agg(Sampling.topKByScore($"id", $"score", 2).as("t"))
      .select(explode($"t").as("s"))
      .select($"s.id").as[Long].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).orderBy($"rn")
      .select($"id").as[Long].collect().toSeq
    assert(viaAgg == viaWindow && viaAgg == Seq(1L, 2L))
  }
}
