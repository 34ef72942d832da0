package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Num

/** User-journey tier: ordered-sequence analytics over the event
  * stream — the operator class event warehouses bolt on beside plain
  * windowed aggregation (ClickHouse's windowFunnel/sequenceMatch,
  * marketing attribution models, clickstream path mining).
  *
  * q155 — STRICTLY-ORDERED funnel (windowFunnel semantics): a user
  * counts for stage N only with an event chain e1 < e2 < … < eN in
  * time order. The windowed funnel (q12) counts stage totals per
  * window regardless of order within it; this one is the
  * did-they-actually-progress measurement.
  *
  * q156 — U-shaped (position-based) multi-touch attribution: each
  * purchase distributes its value over the user's marketing touches
  * in a 7-day lookback — 40% first touch, 40% last, 20% split over
  * the middle (n=1 → 100%, n=2 → 50/50).
  *
  * q157 — session path mining: 30-minute-gap sessionization, then the
  * top-20 3-step event-type paths by frequency.
  *
  * q158 — RFM segmentation: global quintile scores per user on
  * recency/frequency/monetary, ranked via operators.GlobalOrder (no
  * single-reducer window).
  *
  * q160 — session engagement summary (count/length/duration/bounce)
  * over the same sessionization as q157.
  *
  * 100 TB notes: everything here clusters by user_id (or purchase id —
  * a refinement of it) and events-per-user is bounded by human
  * behavior, so no window partition or join group degenerates.
  * q155 runs one equi-join + partial-aggregated min per stage — the
  * per-stage frames carry one row per surviving user, never raw
  * events. q156's lookback join is an equi-join on user_id with the
  * time predicates as join-level filters; the window over p_id
  * re-clusters to per-purchase groups (≤ touches-per-week each).
  * q157 computes sessions AND both leads over ONE user-clustered
  * sort (the session id is carried to the lead rows and compared,
  * instead of re-partitioning by (user, session) — one Exchange, not
  * two); the path space is |event_types|³, so the final top-k is a
  * TakeOrdered over a tiny aggregate.
  */
object JourneyQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  // ---- q155: strictly-ordered funnel view → click → purchase ----

  def q155SeqFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def stage(t: String) = ev.filter(col("event_type") === t)
    val v = stage("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = stage("click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val p = stage("purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"), min(col("t1")).as("t1"))
    v.agg(count(lit(1)).as("users_view"))
      .crossJoin(c.agg(count(lit(1)).as("users_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("users_purchase_after_click"),
        Num.r2(avg(unix_timestamp(col("t3")) - unix_timestamp(col("t1"))))
          .as("avg_convert_sec")))
  }

  val q155Sql: String =
    s"""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
       |           WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
       |      FROM events e JOIN v USING (user_id)
       |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
       |p AS (SELECT e.user_id, min(e.ts) AS t3, min(c.t1) AS t1
       |      FROM events e JOIN c USING (user_id)
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
       |SELECT (SELECT count(*) FROM v) AS users_view,
       |  (SELECT count(*) FROM c) AS users_click_after_view,
       |  (SELECT count(*) FROM p) AS users_purchase_after_click,
       |  (SELECT ${Num.sqlR2("avg(floor(epoch(t3)) - floor(epoch(t1)))")}
       |   FROM p) AS avg_convert_sec""".stripMargin

  // ---- q156: U-shaped multi-touch attribution, 7-day lookback ----

  def q156Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("touch_type"), col("ts").as("t_ts"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
    val byPurchase = Window.partitionBy(col("p_id"))
    val ranked = joined
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rnk", row_number().over(
        byPurchase.orderBy(col("t_ts"), col("t_id"))))
    val weight = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rnk") === 1 || col("rnk") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / (col("n") - 2))
    ranked.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("touches"),
        countDistinct(col("p_id")).as("purchases_touched"),
        Num.r2(sum(weight * col("value"))).as("attributed_revenue"))
      .orderBy(col("touch_type"))
  }

  val q156Sql: String =
    s"""WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts, value
       |           FROM events WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, event_id AS t_id, event_type AS touch_type,
       |        ts AS t_ts
       |      FROM events WHERE event_type IN ('view', 'click')),
       |j AS (SELECT p.p_id, p.value, t.t_id, t.touch_type, t.t_ts
       |      FROM p JOIN t USING (user_id)
       |      WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
       |r AS (SELECT *,
       |        count(*) OVER (PARTITION BY p_id) AS n,
       |        row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rnk
       |      FROM j)
       |SELECT touch_type, count(*) AS touches,
       |  count(DISTINCT p_id) AS purchases_touched,
       |  ${Num.sqlR2(
            "sum((CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5 " +
              "WHEN rnk = 1 OR rnk = n THEN 0.4 " +
              "ELSE 0.2 / (n - 2) END) * value)")} AS attributed_revenue
       |FROM r GROUP BY touch_type ORDER BY touch_type""".stripMargin

  // ---- q157: top 3-step session paths (30-min-gap sessions) ----

  private val SessionGapUs: Long = 1800L * 1000000L
  private val PathTopK = 20

  def q157SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // ts is TIMESTAMP_NTZ (unix_micros wants TIMESTAMP); the session
    // zone is pinned to UTC, so the cast is the identity instant
    val us = unix_micros(col("ts").cast("timestamp"))
    val gap = us - lag(us, 1).over(byUser)
    val withSess = ev
      .withColumn("new_sess",
        when(gap.isNull || gap > SessionGapUs, 1).otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // leads over the SAME user-clustered sort; rows whose 3rd step
    // crosses a session boundary are dropped by comparing the carried
    // session id (sess is monotone per user, so s3 = sess ⇒ s2 = sess)
    withSess
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .withColumn("s3", lead(col("sess"), 2).over(byUser))
      .filter(col("s3") === col("sess"))
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(PathTopK)
  }

  val q157Sql: String =
    s"""WITH s AS (
       |  SELECT user_id, event_type, ts,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
       |      THEN 1 ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |t AS (SELECT *, sum(new_sess) OVER
       |        (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
       |        AS sess
       |      FROM s),
       |p AS (SELECT
       |        event_type || '>' || lead(event_type, 1) OVER w2 || '>' ||
       |          lead(event_type, 2) OVER w2 AS path,
       |        sess, lead(sess, 2) OVER w2 AS s3
       |      FROM t WINDOW w2 AS (PARTITION BY user_id ORDER BY ts))
       |SELECT path, count(*) AS n FROM p WHERE s3 = sess
       |GROUP BY path ORDER BY n DESC, path LIMIT $PathTopK""".stripMargin

  // ---- q158: RFM segmentation (recency / frequency / monetary
  // quintile scores). Scoring is rank-based over a TOTAL order
  // (metric, user_id), bucket = ⌊5·(rank−1)/n⌋ + 1 — the all-ties-
  // broken quintile rule, spelled out identically in both engines
  // (never SQL ntile, whose remainder distribution is the one part
  // engines can disagree on). Spark computes the three global ranks
  // with operators.GlobalOrder (range-partition + per-partition
  // offset — one long per partition of driver state), NOT
  // `row_number() OVER (ORDER BY …)` whose empty frame plans
  // Exchange SinglePartition; the oracle uses the window form, which
  // is bit-identical by GlobalOrder's contract. Monetary is r4-
  // snapped BEFORE ranking so double sum-order can't flip an
  // ordering between engines. ----

  def q158Rfm(spark: SparkSession, dir: String): DataFrame = {
    val pu = events(spark, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        Num.r4(sum(col("value"))).as("monetary"))
    val mx = pu.agg(max(col("last_ts")).as("mts"))
    val r = pu.crossJoin(broadcast(mx))
      .withColumn("recency_days",
        expr("(unix_timestamp(mts) - unix_timestamp(last_ts)) div 86400"))
      .select(col("user_id"), col("recency_days"), col("freq"), col("monetary"))
    val n = broadcast(pu.agg(count(lit(1)).as("n")))
    val ranked = Seq(
      (Seq(col("recency_days"), col("user_id")), "rr"),
      (Seq(col("freq"), col("user_id")), "fr"),
      (Seq(col("monetary"), col("user_id")), "mr"))
      .foldLeft(r) { case (d, (ord, c)) =>
        graft.operators.GlobalOrder.withGlobalPos(d, 8, ord, c)
      }
    ranked.crossJoin(n)
      .select(
        expr("(5 * (rr - 1)) div n + 1").as("r_score"),
        expr("(5 * (fr - 1)) div n + 1").as("f_score"),
        expr("(5 * (mr - 1)) div n + 1").as("m_score"),
        col("monetary"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("users"),
        Num.r2(avg(col("monetary"))).as("avg_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q158Sql: String =
    s"""WITH pu AS (
       |  SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
       |    ${Num.sqlR4("sum(value)")} AS monetary
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |mx AS (SELECT max(last_ts) AS mts FROM pu),
       |r AS (
       |  SELECT user_id,
       |    CAST(floor(epoch(mts)) - floor(epoch(last_ts)) AS BIGINT) // 86400
       |      AS recency_days,
       |    freq, monetary
       |  FROM pu CROSS JOIN mx),
       |k AS (
       |  SELECT *,
       |    row_number() OVER (ORDER BY recency_days, user_id) AS rr,
       |    row_number() OVER (ORDER BY freq, user_id) AS fr,
       |    row_number() OVER (ORDER BY monetary, user_id) AS mr,
       |    count(*) OVER () AS n
       |  FROM r)
       |SELECT (5 * (rr - 1)) // n + 1 AS r_score,
       |  (5 * (fr - 1)) // n + 1 AS f_score,
       |  (5 * (mr - 1)) // n + 1 AS m_score,
       |  count(*) AS users, ${Num.sqlR2("avg(monetary)")} AS avg_monetary
       |FROM k GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---- q160: session summary — the web-analytics companion of
  // q157's path mining: same 30-min-gap sessionization, rolled up to
  // corpus-level engagement stats (one row). ----

  def q160SessionStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("ts"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val us = unix_micros(col("ts").cast("timestamp"))
    val gap = us - lag(us, 1).over(byUser)
    val sessions = ev
      .withColumn("new_sess",
        when(gap.isNull || gap > SessionGapUs, 1).otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      Num.r2(avg(col("n_events"))).as("avg_events"),
      Num.r2(avg(col("duration_sec"))).as("avg_duration_sec"),
      Num.r4(avg(when(col("n_events") === 1, 1.0).otherwise(0.0)))
        .as("bounce_rate"))
  }

  val q160Sql: String =
    s"""WITH s AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
       |      THEN 1 ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |t AS (SELECT *, sum(new_sess) OVER
       |        (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
       |        AS sess
       |      FROM s),
       |g AS (
       |  SELECT user_id, sess, count(*) AS n_events,
       |    CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
       |      AS duration_sec
       |  FROM t GROUP BY 1, 2)
       |SELECT count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users,
       |  ${Num.sqlR2("avg(n_events)")} AS avg_events,
       |  ${Num.sqlR2("avg(duration_sec)")} AS avg_duration_sec,
       |  ${Num.sqlR4("avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END)")}
       |    AS bounce_rate
       |FROM g""".stripMargin

  // ---- q169: seasonality decomposition of the daily event series —
  // classical ratio-to-moving-average: trend = centered 7-day moving
  // average per event type (window FRAME over the tiny daily series,
  // type-partitioned), seasonal index = mean detrended ratio per
  // day-of-week. The index says "Mondays run 0.93× trend" — the
  // normalization a forecasting/anomaly layer divides out first.
  // Ratios are r6-snapped before the per-dow mean so double sum order
  // can't leak; the frame is order-deterministic in both engines. ----

  def q169Seasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val detrended = daily
      .withColumn("n_days", count(lit(1)).over(frame))
      .withColumn("trend", avg(col("n")).over(frame))
      // only FULL 7-day frames: edge days have a biased trend
      .filter(col("n_days") === 7)
      .select(col("event_type"),
        dayofweek(col("day")).as("dow"),
        Num.r(col("n") / col("trend"), 6).as("ratio"))
    detrended.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        Num.r4(avg(col("ratio"))).as("seasonal_index"))
      .orderBy(col("event_type"), col("dow"))
  }

  val q169Sql: String =
    s"""WITH d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |t AS (
       |  SELECT event_type, day, n,
       |    count(*) OVER w AS n_days,
       |    avg(n) OVER w AS trend
       |  FROM d
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |r AS (
       |  SELECT event_type, dayofweek(day) + 1 AS dow,
       |    ${Num.sqlR("n / trend", 6)} AS ratio
       |  FROM t WHERE n_days = 7)
       |SELECT event_type, dow, count(*) AS n_days,
       |  ${Num.sqlR4("avg(ratio)")} AS seasonal_index
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q178: Kaplan–Meier time-to-purchase survival curves per
  // signup-week cohort — censoring-aware conversion analysis (a plain
  // avg of conversion delays silently drops the users who never
  // converted; KM keeps them at-risk until the data horizon). Per
  // user: T = days from first view to first purchase AFTER it
  // (event), else days to the data horizon (censored). Per (cohort,
  // day): d events, c censorings; the at-risk count is the cohort
  // size minus the cumulative prior exits, and
  // S(t) = Π_{s ≤ t}(1 − d_s/n_s), computed as exp(Σ ln(·)) over a
  // cohort-partitioned window (the product telescopes to a cumsum —
  // ln agrees cross-engine exactly as in the PSI oracle). A tie
  // group with d = n would hit ln(0) (Spark null, DuckDB −inf):
  // those rows contribute 0 to the sum and a cumulative flag pins
  // S = 0 from there on, identically in both engines. Output rows
  // are event days only — bounded by cohorts × horizon days. ----

  def q178KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val v1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v1"))
    val p1 = ev.filter(col("event_type") === "purchase")
      .join(v1, "user_id").filter(col("ts") > col("v1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p1"))
    val horizon = broadcast(ev.agg(max(to_date(col("ts"))).as("hday")))
    val durations = v1.join(p1, Seq("user_id"), "left")
      .crossJoin(horizon)
      .select(
        expr("unix_timestamp(v1) div 604800").as("cohort"),
        when(col("p1").isNotNull,
          datediff(to_date(col("p1")), to_date(col("v1"))))
          .otherwise(datediff(col("hday"), to_date(col("v1")))).as("t"),
        when(col("p1").isNotNull, 1L).otherwise(0L).as("event"))
    val byDay = durations.groupBy(col("cohort"), col("t"))
      .agg(sum(col("event")).as("d"),
        sum(lit(1L) - col("event")).as("c"))
    val coSize = durations.groupBy(col("cohort")).agg(count(lit(1)).as("nc"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("t"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.join(broadcast(coSize), "cohort")
      .withColumn("n_risk",
        col("nc") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      .withColumn("lnterm",
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("dead",
        sum(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(cum))
      .withColumn("surv",
        when(col("dead") > 0, lit(0.0))
          .otherwise(Num.r4(exp(sum(col("lnterm")).over(cum)))))
      .filter(col("d") > 0)
      .select(col("cohort"), col("t"), col("n_risk"), col("d").as("d_events"),
        col("surv"))
      .orderBy(col("cohort"), col("t"))
  }

  val q178Sql: String =
    s"""WITH v1 AS (SELECT user_id, min(ts) AS v1 FROM events
       |            WHERE event_type = 'view' GROUP BY 1),
       |p1 AS (SELECT e.user_id, min(e.ts) AS p1
       |       FROM events e JOIN v1 USING (user_id)
       |       WHERE e.event_type = 'purchase' AND e.ts > v1.v1 GROUP BY 1),
       |h AS (SELECT max(CAST(ts AS DATE)) AS hday FROM events),
       |dur AS (
       |  SELECT CAST(floor(epoch(v1.v1)) AS BIGINT) // 604800 AS cohort,
       |    CAST(CASE WHEN p1.p1 IS NOT NULL
       |      THEN date_diff('day', CAST(v1.v1 AS DATE), CAST(p1.p1 AS DATE))
       |      ELSE date_diff('day', CAST(v1.v1 AS DATE), h.hday) END
       |      AS INTEGER) AS t,
       |    CASE WHEN p1.p1 IS NOT NULL THEN 1 ELSE 0 END AS event
       |  FROM v1 LEFT JOIN p1 USING (user_id) CROSS JOIN h),
       |byday AS (
       |  SELECT cohort, t, CAST(sum(event) AS BIGINT) AS d,
       |    CAST(sum(1 - event) AS BIGINT) AS c
       |  FROM dur GROUP BY 1, 2),
       |cs AS (SELECT cohort, count(*) AS nc FROM dur GROUP BY 1),
       |k AS (
       |  SELECT b.cohort, b.t, b.d, b.c, cs.nc,
       |    CAST(cs.nc - coalesce(sum(b.d + b.c) OVER
       |      (PARTITION BY b.cohort ORDER BY b.t
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n_risk
       |  FROM byday b JOIN cs ON b.cohort = cs.cohort),
       |m AS (
       |  SELECT *,
       |    CASE WHEN d < n_risk THEN ln(1.0 - d::DOUBLE / n_risk)
       |         ELSE 0.0 END AS lnterm,
       |    sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY cohort ORDER BY t
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
       |  FROM k)
       |SELECT cohort, t, n_risk, d AS d_events,
       |  CASE WHEN dead > 0 THEN 0.0 ELSE
       |    ${Num.sqlR4("exp(sum(lnterm) OVER (PARTITION BY cohort ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))")}
       |  END AS surv
       |FROM m WHERE d > 0
       |ORDER BY cohort, t""".stripMargin

  // ---- q186: Markov user-behavior model — the per-user event-type
  // transition matrix (lead over each user's time-ordered stream),
  // row-normalized, plus THREE power-iteration rounds toward the
  // stationary distribution from a uniform start. The stationary π is
  // the long-run "where do users spend their time" answer (PageRank's
  // chain is exactly this with teleportation); three unrolled
  // r6-snapped rounds is the q87/q81 cross-engine iteration contract.
  //
  // Shape at 100 TB: the ONLY row-level work is one user-partitioned
  // window (bounded per-user frames, full parallelism); the matrix is
  // |types|² rows, so normalization, the iteration joins, and the
  // final output are all free. The oracle re-derives the identical
  // window, normalization, and unrolled rounds in SQL — the hash
  // match pins every transition count AND the iteration arithmetic. ----

  def q186Markov(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wA = Window.partitionBy(col("a"))
    val p = trans
      .withColumn("p", Num.r(
        col("cnt").cast("double") / sum(col("cnt")).over(wA), 6))
      .select(col("a"), col("b"), col("cnt"), col("p"))
    // π0 uniform over the chain's state set (sources ∪ targets)
    val states = p.select(col("a").as("st"))
      .union(p.select(col("b"))).distinct()
    val s = broadcast(states.agg(count(lit(1)).as("ns")))
    val pi0 = states.crossJoin(s)
      .select(col("st"), (lit(1.0) / col("ns")).as("pi"))
    val pi3 = (1 to 3).foldLeft(pi0) { (pi, _) =>
      // st exists only on the pi side and a only on the matrix side,
      // so the unqualified condition is unambiguous every round
      broadcast(pi).join(p, col("st") === col("a"))
        .groupBy(col("b"))
        .agg(Num.r(sum(col("pi") * col("p")), 6).as("pi"))
        .withColumnRenamed("b", "st")
    }
    pi3.orderBy(col("st"))
  }

  val q186Sql: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT p.b AS st, ${Num.sqlR("sum(x.pi * p.p)", 6)} AS pi
         |  FROM $prev x JOIN p ON x.st = p.a GROUP BY p.b)"""
    s"""WITH t AS (
       |  SELECT event_type AS a,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |                              ORDER BY ts, event_id) AS b
       |  FROM events),
       |m AS (SELECT a, b, count(*) AS cnt FROM t
       |      WHERE b IS NOT NULL GROUP BY a, b),
       |p AS (SELECT a, b, cnt,
       |        ${Num.sqlR(
          "cnt::DOUBLE / sum(cnt) OVER (PARTITION BY a)", 6)} AS p
       |      FROM m),
       |st AS (SELECT DISTINCT a AS st FROM p
       |       UNION SELECT DISTINCT b FROM p),
       |ns AS (SELECT count(*) AS ns FROM st),
       |pi0 AS (SELECT st, (1.0::DOUBLE / ns) AS pi
       |        FROM st CROSS JOIN ns),
       |${round("pi0", "pi1")},
       |${round("pi1", "pi2")},
       |${round("pi2", "pi3")}
       |SELECT st, pi FROM pi3 ORDER BY st""".stripMargin
  }

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_seq_funnel" -> (q155SeqFunnel _),
    "q156_attribution" -> (q156Attribution _),
    "q157_session_paths" -> (q157SessionPaths _),
    "q158_rfm" -> (q158Rfm _),
    "q160_session_stats" -> (q160SessionStats _),
    "q169_seasonality" -> (q169Seasonality _),
    "q178_kaplan_meier" -> (q178KaplanMeier _),
    "q186_markov" -> (q186Markov _))

  def oracles: Map[String, String] = Map(
    "q155_seq_funnel" -> q155Sql,
    "q156_attribution" -> q156Sql,
    "q157_session_paths" -> q157Sql,
    "q158_rfm" -> q158Sql,
    "q160_session_stats" -> q160Sql,
    "q169_seasonality" -> q169Sql,
    "q178_kaplan_meier" -> q178Sql,
    "q186_markov" -> q186Sql)
}
