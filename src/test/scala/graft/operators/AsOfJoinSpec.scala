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
