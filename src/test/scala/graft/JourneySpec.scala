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

  test("q158: GlobalOrder rank scoring matches the single-window form") {
    // the oracle pins Spark ≡ DuckDB on the range-partitioned path;
    // this pins the range-partitioned path ≡ the textbook
    // row_number() OVER (ORDER BY …) form within Spark itself
    val got = JourneyQueries.q158Rfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.load(spark, dir, "events")
    import org.apache.spark.sql.expressions.Window
    val pu = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        graft.operators.Num.r4(sum(col("value"))).as("monetary"))
    val r = pu.crossJoin(pu.agg(max(col("last_ts")).as("mts")))
      .withColumn("recency_days",
        expr("(unix_timestamp(mts) - unix_timestamp(last_ts)) div 86400"))
    val k = r
      .withColumn("rr", row_number().over(
        Window.orderBy(col("recency_days"), col("user_id"))))
      .withColumn("fr", row_number().over(
        Window.orderBy(col("freq"), col("user_id"))))
      .withColumn("mr", row_number().over(
        Window.orderBy(col("monetary"), col("user_id"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy()))
    val want = k.groupBy(
        expr("(5 * (rr - 1)) div n + 1").as("r_score"),
        expr("(5 * (fr - 1)) div n + 1").as("f_score"),
        expr("(5 * (mr - 1)) div n + 1").as("m_score"))
      .agg(count(lit(1)).as("users"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet === want.toSet)
  }

  test("q159: basket rules respect the downward-closure count bounds") {
    val rows = graft.queries.WarehouseQueries.q159Basket(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (support, confidence, lift) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(support > 0 && support <= 1.0)
      assert(confidence >= support - 1e-9 && confidence <= 1.0)
      assert(lift > 0)
      assert(r.getString(0) < r.getString(1))
    }
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
