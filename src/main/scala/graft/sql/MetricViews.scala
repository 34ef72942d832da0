package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Downstream SQL surface (SURVEY.md §2.12/§3.3, build plan B6): the
  * reference's Postgres views (init_metrics.sql:157-239) re-expressed
  * as Spark SQL views over the engine's own metric outputs, so the
  * whole system — processors AND dashboards — is answerable inside one
  * SparkSession.
  *
  * `sinceHoursAgo` parameterizes the views' `NOW() - INTERVAL '1 hour'`
  * freshness filter; None disables it (deterministic tests / backfill
  * analysis over historical replays).
  */
object MetricViews {

  /** Register the four metric DataFrames as tables + the four views.
    * Call after a batch write or inside foreachBatch for live views. */
  def register(spark: SparkSession,
      funnel: DataFrame, gmv: DataFrame, dropOff: DataFrame, payment: DataFrame,
      sinceHoursAgo: Option[Int] = None): Unit = {
    funnel.createOrReplaceTempView("real_time_funnel")
    gmv.createOrReplaceTempView("gmv_metrics")
    dropOff.createOrReplaceTempView("drop_off_analysis")
    payment.createOrReplaceTempView("payment_metrics")
    val fresh = sinceHoursAgo
      .map(h => s"window_start >= current_timestamp() - INTERVAL $h HOUR")
      .getOrElse("true")

    // v_latest_funnel (init_metrics.sql:156-170)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW v_latest_funnel AS
         |SELECT window_start, window_end, total_orders, orders_with_items,
         |       orders_with_payment, items_conversion_rate,
         |       payment_conversion_rate, dropped_after_order,
         |       dropped_after_items
         |FROM real_time_funnel
         |WHERE $fresh
         |ORDER BY window_start DESC""".stripMargin)

    // v_complete_funnel (init_metrics.sql:175-209): window-equality
    // LEFT JOINs funnel ⟕ gmv ⟕ payment-regroup — J1 in the operator
    // inventory. All sides share the (window_start, window_end) key, so
    // at scale the three shuffles co-partition and the joins are
    // exchange-free after the first.
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW v_complete_funnel AS
        |SELECT
        |  f.window_start, f.window_end, f.total_orders,
        |  f.orders_with_items, f.orders_with_payment,
        |  f.items_conversion_rate, f.payment_conversion_rate,
        |  f.dropped_after_order, f.dropped_after_items,
        |  COALESCE(g.gmv, 0) AS total_gmv,
        |  COALESCE(g.item_count, 0) AS total_items,
        |  COALESCE(p.total_payment, 0) AS total_payment,
        |  COALESCE(p.avg_payment, 0) AS avg_payment_value,
        |  f.processed_at
        |FROM real_time_funnel f
        |LEFT JOIN gmv_metrics g
        |  ON f.window_start = g.window_start AND f.window_end = g.window_end
        |LEFT JOIN (
        |  SELECT window_start, window_end,
        |         SUM(total_payment_value) AS total_payment,
        |         AVG(avg_payment_value) AS avg_payment
        |  FROM payment_metrics
        |  GROUP BY window_start, window_end
        |) p ON f.window_start = p.window_start AND f.window_end = p.window_end
        |ORDER BY f.window_start DESC""".stripMargin)

    // v_payment_performance (init_metrics.sql:212-223)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW v_payment_performance AS
         |SELECT payment_type,
         |       SUM(transaction_count) AS total_transactions,
         |       SUM(total_payment_value) AS total_value,
         |       AVG(avg_payment_value) AS avg_value,
         |       AVG(success_rate) AS avg_success_rate
         |FROM payment_metrics
         |WHERE $fresh
         |GROUP BY payment_type
         |ORDER BY total_value DESC""".stripMargin)

    // v_active_alerts (init_metrics.sql:226-239)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW v_active_alerts AS
         |SELECT window_start, window_end, order_status, dropped_orders,
         |       unique_customers_affected, sample_order_ids, detected_at
         |FROM drop_off_analysis
         |WHERE alert_triggered = TRUE AND $fresh
         |ORDER BY dropped_orders DESC""".stripMargin)
  }

  /** The Grafana dashboard's ops queries (ecommerce-streaming.json;
    * Makefile:130-153) as ready-made DataFrames. */
  def latestFunnel(spark: SparkSession, limit: Int = 50): DataFrame =
    spark.table("v_latest_funnel").limit(limit)

  def completeFunnel(spark: SparkSession, limit: Int = 50): DataFrame =
    spark.table("v_complete_funnel").limit(limit)

  def paymentPerformance(spark: SparkSession): DataFrame =
    spark.table("v_payment_performance")

  def activeAlerts(spark: SparkSession): DataFrame =
    spark.table("v_active_alerts")

  /** BOOL_OR alert rollup (ecommerce-streaming.json:346) — Spark 4 has
    * bool_or natively. */
  def alertSummary(spark: SparkSession): DataFrame =
    spark.sql(
      """SELECT order_status, bool_or(alert_triggered) AS any_alert,
        |       SUM(dropped_orders) AS total_dropped
        |FROM drop_off_analysis
        |GROUP BY order_status
        |ORDER BY order_status""".stripMargin)
}
