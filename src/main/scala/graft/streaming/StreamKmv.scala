package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Kmv

/** Streaming KMV distinct-cardinality sketch — the incremental twin
  * of operators.Kmv: per key, maintain the bottom-k distinct
  * normalized hashes as flatMapGroupsWithState state (k doubles — the
  * bounded-model-state shape, no growing distinct set), emit the
  * refreshed estimate every micro-batch that touches the key.
  *
  * Because the synopsis is an order statistic of a DETERMINISTIC
  * md5-derived hash, the streamed state after any prefix of the data
  * equals the batch synopsis of that prefix exactly — not
  * approximately (spec-pinned). That also makes the sketch mergeable
  * across streams the way q95 merges it across sets.
  *
  * 100 TB shape: state per key is k doubles regardless of stream
  * volume; each batch touches only the keys present in the batch;
  * the pre-aggregation to distinct (key, u) pairs happens inside the
  * batch before the state lookup.
  */
object StreamKmv {

  final case class In(key: String, u: Double)
  final case class Syn(values: Array[Double])
  final case class Est(key: String, support: Long, hk: Double,
      estimate: Double)

  def step(k: Int)(key: String, rows: Iterator[In],
      state: GroupState[Syn]): Iterator[Est] = {
    val prev: Array[Double] =
      if (state.exists) state.get.values else Array.empty[Double]
    val merged = (prev ++ rows.map(_.u)).distinct.sorted.take(k)
    state.update(Syn(merged))
    val n = merged.length.toLong
    val hk = if (n == 0) 1.0 else merged.last
    Iterator.single(Est(key, n, hk, Kmv.estimate(n, hk, k)))
  }

  /** `stream` needs (key: string, item: any castable to string).
    * Emits (key, support, hk, estimate) per touched key per batch
    * (Update mode). */
  def distinctEstimates(stream: DataFrame, itemCol: String, keyCol: String,
      k: Int): Dataset[Est] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("key"),
        Kmv.normHash(col(itemCol)).as("u"))
      .as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step(k))
  }
}
