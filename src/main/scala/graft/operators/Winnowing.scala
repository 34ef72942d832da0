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
    // Selection runs IN-ARRAY, per document: the whole document is one
    // row, so the sliding minimum needs no cross-row machinery — the
    // old `min(struct) OVER (PARTITION BY doc_id)` + `distinct()` form
    // paid a full shuffle+sort of every gram occurrence plus a second
    // distinct exchange for something each row can compute alone
    // (guide §2.4: remove shuffles outright). O(n_grams · w) per doc
    // with w small; zero exchanges.
    //
    // Three chained projections, each heavy column referenced ≥2 times
    // downstream so CollapseProject keeps them materialized (a single
    // collapsed tree would re-run the tokenizer per reference):
    //   sh: the k-gram strings;  hp: (h, np) structs with np = -p so
    //   the natural struct MIN is (smallest h, RIGHTMOST p) — the MOSS
    //   tie-break;  fps: per-window-start array_min over the w-slice,
    //   array_distinct'd. Window starts 0..max(n_grams-w, 0): just
    //   s=0 (a truncated slice) for short docs — MOSS's short-doc rule.
    val hp = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col(textCol)), k).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), (g, p) =>
          struct(TextFunctions.hash60(g).as("h"), (-p).as("np"))).as("hp"))
    // array_compact: a gram-less doc yields slice([]) → array_min null;
    // compacting drops it so empty docs emit no rows (the old explode
    // behaviour). Non-empty docs never produce null minima (every
    // window slice from a valid start is non-empty).
    hp
      .select(col("doc_id"),
        explode(array_compact(array_distinct(transform(
          sequence(lit(0), greatest(size(col("hp")) - w, lit(0))),
          s => array_min(slice(col("hp"), s + 1, lit(w))))))).as("m"))
      .select(col("doc_id"), col("m.h").as("fp_hash"),
        (-col("m.np")).as("fp_pos"))
  }

  /** Distinct (doc_id, fp_hash) pairs — [[fingerprints]] with the
    * positions dropped and the hash set deduped IN-ARRAY before the
    * explode (position-distinct selections collapse to hash-distinct
    * per doc; cross-doc dups are impossible by keying), so consumers
    * that only need the hash set skip the post-explode `distinct()`
    * exchange entirely. */
  def fingerprintHashes(docs: DataFrame, k: Int = 3, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hp = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col(textCol)), k).as("sh"))
      .select(col("doc_id"),
        transform(col("sh"), (g, p) =>
          struct(TextFunctions.hash60(g).as("h"), (-p).as("np"))).as("hp"))
    hp
      .select(col("doc_id"),
        explode(array_distinct(array_compact(transform(
          sequence(lit(0), greatest(size(col("hp")) - w, lit(0))),
          s => array_min(slice(col("hp"), s + 1, lit(w))).getField("h")))))
          .as("fp_hash"))
  }

  /** Corpus fingerprint INDEX for incremental probing: distinct
    * (doc_id, fp_hash) with hashes in more than `maxDf` corpus docs
    * dropped (boilerplate guard — bounds every probe bucket). Build
    * once, persist alongside the corpus, probe every ingest batch. */
  def index(corpus: DataFrame, k: Int = 3, w: Int = 4, maxDf: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = fingerprintHashes(corpus, k, w, idCol, textCol)
      .select(col("doc_id").as("corpus_doc"), col("fp_hash"))
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
    val bfp = fingerprintHashes(batch, k, w, idCol, textCol).cache()
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
