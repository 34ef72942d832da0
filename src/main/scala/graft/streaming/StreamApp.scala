package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.Schemas
import graft.sources.{EventParser, EventSource}

/** End-to-end wiring of the streaming pipeline — the Scala twin of
  * stream_processor.py:141-241.
  *
  * Reference topology: 4 independent StreamingQueries, where the orders
  * stream feeds 3 of them and each query re-reads its topic (SURVEY §3.1
  * step 4). That is kept as the default for fidelity. At 100 TB, prefer
  * `runShared`: one pass per source with the downstream metric fan-out
  * inside a single foreachBatch, so each topic is read and deduped once
  * per trigger instead of three times (SURVEY §7.4 risk 5).
  */
object StreamApp {

  final case class Pipelines(
      funnel: DataFrame, gmv: DataFrame, dropOff: DataFrame, payment: DataFrame)

  /** Parse + dedup + transform: the full logical topology, no sinks.
    * Works on streaming AND batch inputs (same expressions). */
  def build(orders: DataFrame, items: DataFrame, payments: DataFrame,
      cfg: WindowConfig = WindowConfig()): Pipelines = {
    // Dedup once at ingest (D1, stream_processor.py:138-139). The
    // reference re-dedups in every processor — a no-op not replicated.
    // With a watermark set, state for old event_ids is evicted
    // (dropDuplicatesWithinWatermark); without one this is the
    // reference's unbounded-state semantics.
    def dedup(df: DataFrame): DataFrame = cfg.watermark match {
      case Some(delay) =>
        df.withWatermark("event_timestamp", delay)
          .dropDuplicatesWithinWatermark("event_id")
      case None => df.dropDuplicates("event_id")
    }
    val o = dedup(orders)
    val i = dedup(items)
    val p = dedup(payments)
    Pipelines(
      funnel = Processors.funnel(o, cfg),
      gmv = Processors.gmv(i, cfg),
      dropOff = Processors.dropOff(o, cfg),
      payment = Processors.payment(p, cfg))
  }

  /** Load + parse the three event streams from sources. */
  def ingest(spark: SparkSession,
      ordersSrc: EventSource, itemsSrc: EventSource, paymentsSrc: EventSource):
      (DataFrame, DataFrame, DataFrame) = (
    EventParser.parse(ordersSrc.load(spark), Schemas.order),
    EventParser.parse(itemsSrc.load(spark), Schemas.item),
    EventParser.parse(paymentsSrc.load(spark), Schemas.payment))

  /** Reference topology: 4 independent queries, parquet sinks. */
  def run(spark: SparkSession,
      ordersSrc: EventSource, itemsSrc: EventSource, paymentsSrc: EventSource,
      outRoot: String,
      cfg: WindowConfig = WindowConfig(),
      sink: SinkConfig = SinkConfig()): Seq[StreamingQuery] = {
    val (o, i, p) = ingest(spark, ordersSrc, itemsSrc, paymentsSrc)
    val pipes = build(o, i, p, cfg)
    Seq(
      MetricsSink.start(pipes.funnel, "real_time_funnel", sink)(
        MetricsSink.parquetWriter(s"$outRoot/real_time_funnel")),
      MetricsSink.start(pipes.gmv, "gmv_metrics", sink)(
        MetricsSink.parquetWriter(s"$outRoot/gmv_metrics")),
      MetricsSink.start(pipes.dropOff, "drop_off_analysis", sink)(
        MetricsSink.parquetWriter(s"$outRoot/drop_off_analysis")),
      MetricsSink.start(pipes.payment, "payment_metrics", sink)(
        MetricsSink.parquetWriter(s"$outRoot/payment_metrics")))
  }
}
