package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.operators.TextDedup

/** Streamed batch-vs-corpus verdicts equal the batch operator's on
  * the same documents, across micro-batch boundaries, and each
  * micro-batch dedups against the STATIC corpus only. */
class StreamIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"))

  private val batchRows = Seq(
    (101L, "alpha  beta gamma delta epsilon zeta eta theta"), // exact copy of 1
    (102L, "one two three four five six seven eight nine inserted ten"), // near copy of 2
    (103L, "completely different content with no overlap at all whatsoever"),
    (104L, "one two three four five six seven eight nine ten extra"))

  test("streamed verdicts ≡ batch verdicts across micro-batch boundaries") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)](spark)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = StreamIncrementalDedup.writer(
      in.toDF().toDF("doc_id", "text"), corpus,
      n = 3, threshold = 0.4, maxBucket = 1000, triggerMs = 50L) { (_, verdicts) =>
      collected ++= verdicts.as[(Long, String, Long)].collect()
    }.start()
    try {
      in.addData(batchRows.take(2))
      q.processAllAvailable()
      in.addData(batchRows.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    val batchVerdicts = TextDedup.incrementalDedup(
      batchRows.toDF("doc_id", "text"), corpus, n = 3, threshold = 0.4)
      .as[(Long, String, Long)].collect().toSet
    assert(collected.toSet == batchVerdicts && collected.size == 4)
    val byId = collected.map(r => r._1 -> r._2).toMap
    assert(byId(101L) == "dup_exact" && byId(102L) == "dup_near" &&
      byId(103L) == "new" && byId(104L) == "dup_near")
  }

  test("micro-batches dedup against the static corpus, not each other") {
    val corpus = Seq((1L, "p q r s t u v w")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)](spark)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = StreamIncrementalDedup.writer(
      in.toDF().toDF("doc_id", "text"), corpus,
      n = 3, threshold = 0.4, maxBucket = 1000, triggerMs = 50L) { (_, verdicts) =>
      collected ++= verdicts.as[(Long, String, Long)].collect()
    }.start()
    try {
      // identical novel doc in two different micro-batches: both must
      // report 'new' vs the corpus — intra-stream dedup is StreamDedup's
      // job, composable upstream
      in.addData(Seq((10L, "x y z a b c d e")))
      q.processAllAvailable()
      in.addData(Seq((11L, "x y z a b c d e")))
      q.processAllAvailable()
    } finally q.stop()
    assert(collected.map(r => (r._1, r._2)).toSet ==
      Set((10L, "new"), (11L, "new")))
  }
}
