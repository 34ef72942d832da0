package graft

import org.apache.spark.sql.functions._
import graft.queries.JourneyQueries

/** Semantic invariants of the user-journey tier on the sf0.001
  * testdata (the oracle proves Spark ≡ DuckDB; these pin properties
  * of the SEMANTICS both engines could get wrong together). */
class JourneySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q155: strictly-ordered funnel stages are monotone non-increasing") {
    val r = JourneyQueries.q155SeqFunnel(spark, dir).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p)
    // ordered funnel can never exceed the unordered per-user bound:
    // users with at least one event of every stage type
    val ev = Tables.load(spark, dir, "events")
    val unordered = ev.groupBy("user_id")
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      .filter(col("v") === 1 && col("c") === 1 && col("p") === 1)
      .count()
    assert(p <= unordered)
  }

  test("q156: attribution weights per purchase sum to exactly the purchase value") {
    val attributed = JourneyQueries.q156Attribution(spark, dir)
      .agg(sum(col("attributed_revenue"))).head().getDouble(0)
    // every purchase with >= 1 touch in the 7-day lookback hands out
    // exactly 100% of its value (1.0 / 0.5+0.5 / 0.4+0.2·(n−2)/(n−2)+0.4)
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("t_ts"))
    val expected = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
      .select(col("p_id"), col("value")).distinct()
      .agg(sum(col("value"))).head().getDouble(0)
    assert(math.abs(attributed - expected) < 1e-4,
      s"attributed=$attributed expected=$expected")
  }

  test("q157: session paths are 3-step, bounded, and positively counted") {
    val rows = JourneyQueries.q157SessionPaths(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length === 3 && parts.forall(types.contains))
      assert(r.getLong(1) > 0)
    }
    // counts are sorted non-increasing (top-k order)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
