package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide a
  * window of `w` consecutive gram hashes over the document, and keep
  * the minimum hash of each window (rightmost minimum on ties). The
  * selected set is a position-aware fingerprint with two published
  * guarantees: any shared substring of at least w+k-1 tokens yields at
  * least one shared fingerprint, and expected density is 2/(w+1).
  *
  * Where MinHash answers "are these documents similar as BAGS of
  * shingles", winnowing answers "do they share CONTIGUOUS runs" — the
  * substring-level near-dup / contamination signal (the span form of
  * q71's exact dup-span scan, cheap enough to run corpus-wide).
  *
  * Scale shape: one projection (tokens → grams → hash60) and ONE
  * doc-partitioned window pass — no self-join, no explode beyond the
  * gram list, state per partition bounded by w rows of lookahead.
  * Selection is per-document, so the shuffle key is doc_id and skew is
  * bounded by document length. The cross-document pair query downstream
  * buckets by fingerprint hash with a document-frequency guard
  * (boilerplate hashes capped), the LSH-bucket discipline.
  */
object Winnowing {

  /** Per-document winnowed fingerprints: (doc_id, fp_hash, fp_pos),
    * distinct. `k` = tokens per gram, `w` = grams per window.
    * Documents with fewer than k tokens produce no fingerprints;
    * documents with fewer than w grams contribute the minimum of what
    * they have (the s=0 truncated window — MOSS's short-doc rule). */
  def fingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col(textCol)), k).as("sh"))
      .filter(size(col("sh")) >= 1)
      .select(col("doc_id"), size(col("sh")).as("n_grams"),
        posexplode(col("sh")).as(Seq("p", "gram")))
      .select(col("doc_id"), col("n_grams"), col("p"),
        TextFunctions.hash60(col("gram")).as("h"))
    // Window minimum with RIGHTMOST tie-break: min of (h, -p) structs —
    // field-order comparison gives smallest h, then largest p.
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, w - 1)
    val m: Column = min(struct(col("h"), (-col("p")).as("np"))).over(frame)
    grams
      .withColumn("m", m)
      // valid window starts: 0..n_grams-w (just s=0 for short docs)
      .filter(col("p") <= greatest(col("n_grams") - w, lit(0)))
      .select(col("doc_id"), col("m.h").as("fp_hash"),
        (-col("m.np")).as("fp_pos"))
      .distinct()
  }

  /** Corpus fingerprint INDEX for incremental probing: distinct
    * (doc_id, fp_hash) with hashes in more than `maxDf` corpus docs
    * dropped (boilerplate guard — bounds every probe bucket). Build
    * once, persist alongside the corpus, probe every ingest batch. */
  def index(corpus: DataFrame, k: Int = 3, w: Int = 4, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = fingerprints(corpus, k, w, idCol, textCol)
      .select(col(idCol).as("corpus_doc"), col("fp_hash")).distinct()
    fp.join(
      fp.groupBy(col("fp_hash")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf),
      Seq("fp_hash"))
      .select(col("corpus_doc"), col("fp_hash"))
  }

  /** Probe a batch of documents against a prebuilt corpus [[index]]:
    * per (batch doc, corpus doc) pair sharing at least `minShared`
    * surviving fingerprints, the shared count and the overlap fraction
    * of the BATCH doc's fingerprint set (containment direction — "how
    * much of the new doc is already in the corpus").
    *
    * Scale shape: the batch fingerprints once (window pass over the
    * batch only), then ONE hash-keyed equi join against the index —
    * never batch×batch or corpus×corpus; bucket width is bounded by
    * the index's df guard. */
  def probeAgainst(batch: DataFrame, corpusIndex: DataFrame,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bfp = fingerprints(batch, k, w, idCol, textCol)
      .select(col("doc_id"), col("fp_hash")).distinct().cache()
    val sizes = bfp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    bfp.join(corpusIndex, Seq("fp_hash"))
      .groupBy(col("doc_id"), col("corpus_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(broadcast(sizes), Seq("doc_id"))
      .select(col("doc_id"), col("corpus_doc"), col("shared"),
        graft.operators.Num.r4(
          col("shared").cast("double") / col("n_fp").cast("double")).as("overlap"))
  }
}
