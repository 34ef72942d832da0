package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The composed end-to-end curation job a training-data pipeline runs
  * between raw ingest and export — each stage is an operator that is
  * also oracle-checked standalone:
  *
  *   1. scrub      — PII/URL/entity masking (q40's passes)
  *   2. quality    — minimum-token gate on the scrubbed text (q21/q22)
  *   3. exact dedup — first (min doc_id) copy per content fingerprint
  *                    (q20's fingerprint, window-ranked per group)
  *   4. split      — deterministic 80/10/10 content-hash assignment
  *                    (q56)
  *
  * The whole chain is one declarative plan: Catalyst fuses stages 1–2
  * into the scan projection, stage 3 is the single shuffle (keyed by
  * fingerprint), stage 4 is narrow again. q61 runs the chain against a
  * DuckDB CTE chain of the same stages.
  *
  * 100 TB notes: per-stage costs are narrow except the dedup shuffle,
  * which carries (fingerprint, doc_id, lang, token count) — never the
  * text. Near-dup clustering (MinHash → ClusterDedup) composes after
  * stage 3 with the same shape; it is covered by q25/q36 standalone.
  */
object CurationPipeline {

  // regex passes shared with q40's standalone scrub query
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_-]+"
  val EntityRe = "\\b(spark|customer)\\b"

  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      EntityRe, "<ENT>")

  /** Curated corpus: (doc_id, lang, split, toks, clean) — scrubbed,
    * quality-gated, exactly-deduped, split-assigned. */
  def curate(docs: DataFrame, minTokens: Int = 20): DataFrame = {
    val dedupW = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"), scrubbed(col("text")).as("clean"))
      .withColumn("toks", size(tokens(col("clean"))).cast("long"))
      .filter(col("toks") >= minTokens)
      .withColumn("fp", fingerprint(col("clean")))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .withColumn("split", splitAssign(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("split"), col("toks"), col("clean"))
  }

  /** Per-(split, lang) corpus accounting of the curated output. */
  def stats(curated: DataFrame): DataFrame =
    curated.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("toks")).as("tokens"),
        Num.r2(avg(col("toks"))).as("avg_tokens"))
      .orderBy(col("split"), col("lang"))
}
