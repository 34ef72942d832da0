package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    ("A", ts("2024-01-01 10:00:10"), 100.0),
    ("A", ts("2024-01-01 10:02:00"), 101.0),
    ("B", ts("2024-01-01 10:00:05"), 50.0))
    .toDF("sym", "ts", "px")

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 99.5),
    ("A", ts("2024-01-01 10:01:00"), 100.5),
    ("B", ts("2024-01-01 10:30:00"), 51.0)) // after B's trade
    .toDF("sym", "ts", "bid")

  test("asof picks the most recent right row at-or-before left") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts",
      leftCols = Seq("px"), rightCols = Seq("bid"))
      .orderBy("sym", "ts")
      .select("sym", "px", "asof_bid").as[(String, Double, Option[Double])]
      .collect()
    assert(out.sameElements(Array(
      ("A", 100.0, Some(99.5)),   // 10:00:10 → quote at 10:00:00
      ("A", 101.0, Some(100.5)),  // 10:02:00 → quote at 10:01:00
      ("B", 50.0, None))))        // no quote before the trade
  }

  test("equal timestamps match (right sorts before left on ties)") {
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "ts", "px")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 9.0)).toDF("sym", "ts", "bid")
    val out = AsOfJoin.asOf(l, r, "sym", "ts", "ts", Seq("px"), Seq("bid"))
      .select("asof_bid").as[Option[Double]].collect()
    assert(out.sameElements(Array(Some(9.0))))
  }

  test("native operator (custom LogicalPlan/Strategy/SparkPlan) matches " +
      "the DataFrame formulation") {
    val viaWindow = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts",
      leftCols = Seq("px"), rightCols = Seq("bid"))
      .select("sym", "px", "asof_ts", "asof_bid")
      .as[(String, Double, Option[Timestamp], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    val native = AsOfJoin.asOfNative(trades, quotes, "sym", "ts", "ts",
      rightCols = Seq("bid"))
      .select("sym", "px", "asof_ts", "asof_bid")
      .as[(String, Double, Option[Timestamp], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    assert(viaWindow.sameElements(native))
  }

  test("native operator plans one exchange + sort per side") {
    val df = AsOfJoin.asOfNative(trades, quotes, "sym", "ts", "ts", Seq("bid"))
    df.collect() // materialize AQE final plan
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
    assert(plan.contains("Sort"), plan)
  }

  test("native operator at scale grain: purchases asof views on events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value")
    val viaWindow = AsOfJoin.asOf(purchases, views, "user_id", "ts", "ts",
      leftCols = Seq("value"), rightCols = Seq("value"))
      .select($"user_id", $"ts", $"asof_ts")
      .as[(Long, Timestamp, Option[Timestamp])].collect().sortBy(r => (r._1, r._2.getTime))
    val native = AsOfJoin.asOfNative(purchases, views, "user_id", "ts", "ts",
      rightCols = Seq("value"))
      .select($"user_id", $"ts", $"asof_ts")
      .as[(Long, Timestamp, Option[Timestamp])].collect().sortBy(r => (r._1, r._2.getTime))
    assert(viaWindow.sameElements(native))
    assert(native.length == purchases.count())
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts",
      leftCols = Seq("px"), rightCols = Seq("bid"),
      toleranceSec = Some(30))
      .orderBy("sym", "ts")
      .select("sym", "asof_bid").as[(String, Option[Double])].collect()
    assert(out.sameElements(Array(
      ("A", Some(99.5)),  // 10 s gap ≤ 30
      ("A", None),        // 60 s gap > 30
      ("B", None))))
  }
}
