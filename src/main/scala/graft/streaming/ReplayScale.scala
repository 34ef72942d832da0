package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Replay contract at SCALE for the heaviest streaming twin (r14
  * verdict item 7): the 18 ReplayContractSpec twins pin streamed ≡
  * batch at test scale; this main runs the incremental-dedup twin
  * once at a real SF (default the generated sf1: ~10× the graded
  * sweep) and emits one machine-checkable JSON line — order-
  * independent fingerprint of the streamed verdicts vs the batch
  * operator's on the same documents, micro-batch count, and the
  * state-store plateau (this twin is deliberately STATELESS — the
  * corpus is a static cached relation and foreachBatch applies the
  * batch operator, so stateOperators must stay empty; a nonzero row
  * count here means the topology regressed into keeping state).
  *
  * Usage: runMain graft.streaming.ReplayScale [sfDir] [slices]
  * Exits 1 on fingerprint mismatch or unexpected state.
  */
object ReplayScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val slices = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-replay-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // micro_batches and state_rows_max below are read from
      // recentProgress, which retains only the LAST N progress events
      // (default 100) — a run with more triggers than that would
      // under-count batches and could miss an early nonzero
      // stateOperators row count, passing state_rows_max == 0 falsely.
      // Retain far more events than any slices argument produces.
      .config("spark.sql.streaming.numRecentProgressUpdates", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Files.createTempDirectory("graft-replay-scale").toString

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // 90% static corpus, 10% arriving stream — the production split
    // this twin models (a day's ingest against the stored corpus)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0).cache()
    val corpusDocs = corpus.count() // materialize before streaming starts
    docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .repartition(slices).write.mode("overwrite").parquet(s"$out/stream")
    val streamDocs = spark.read.parquet(s"$out/stream").count()

    val t0 = System.nanoTime()
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$out/stream").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/stream")
    val q = StreamIncrementalDedup.start(streamed, corpus,
      n = 3, threshold = 0.5, maxBucket = 1000, triggerMs = 200L) {
      (_, verdicts) =>
        verdicts.write.mode("append").parquet(s"$out/verdicts")
    }
    q.processAllAvailable()
    val progresses = q.recentProgress.toSeq
    val stateRowsMax = progresses
      .flatMap(_.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
    val batches = progresses.count(_.numInputRows > 0)
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    val streamedFp = graft.CrossPlan.fingerprint(
      spark.read.parquet(s"$out/verdicts"))
    val batchFp = graft.CrossPlan.fingerprint(TextDedup.incrementalDedup(
      spark.read.parquet(s"$out/stream"), corpus,
      n = 3, threshold = 0.5, maxBucket = 1000))
    val ok = streamedFp == batchFp && stateRowsMax == 0L && streamedFp.rows > 0
    println(s"""{"metric":"replay_scale","twin":"incremental_dedup",""" +
      s""""sf":"$sfDir","corpus_docs":$corpusDocs,"stream_docs":$streamDocs,""" +
      s""""micro_batches":$batches,"state_rows_max":$stateRowsMax,""" +
      s""""wall_sec":${math.rint(wall * 10) / 10},""" +
      s""""streamed_fp":{"rows":${streamedFp.rows},"sum":"${streamedFp.sum}","xor":${streamedFp.xor}},""" +
      s""""batch_fp":{"rows":${batchFp.rows},"sum":"${batchFp.sum}","xor":${batchFp.xor}},""" +
      s""""replay_contract_match":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
