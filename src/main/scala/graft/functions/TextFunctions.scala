package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import graft.plans.Md5PrefixHash

/** Text-analysis primitives for the LLM-data-pipeline tier (builder
  * brief; BASELINE.json north star): tokenization, shingling,
  * cross-engine hashing, language-ID, quality scoring, fingerprints.
  *
  * Everything here is built-in `functions._` (codegen'd, no UDFs) and
  * has an exact DuckDB twin (the `sql*` builders) so the oracle can
  * hash-compare — the hashes are md5-prefix based because md5 is the
  * one 128-bit hash both engines expose identically.
  *
  * 100 TB note: all of these are narrow per-row transforms — no
  * shuffle, fully pipelined inside WholeStageCodegen, safe at any
  * scale. The expensive parts (explode + join) live in the dedup
  * operators, not here.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")
  def sqlTokens(text: String): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), t -> t <> '')"

  /** Word n-gram shingles (space-joined). Empty when fewer than n
    * tokens.
    *
    * Perf note: pass an already-materialized token ARRAY column here
    * (tokenize in a projection below), not `tokens(text)` inline — an
    * inline tree repeats the regex split once per lambda element
    * (O(tokens × shingles) splits per row; measured 2× on the shingle
    * operators). */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array())

  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)
  def sqlShingles(text: String, n: Int): String = {
    val ts = sqlTokens(text)
    s"""CASE WHEN len($ts) >= $n
       | THEN list_transform(range(1, len($ts) - ${n - 2}),
       |        i -> array_to_string(list_slice($ts, i, i + ${n - 1}), ' '))
       | ELSE [] END""".stripMargin
  }

  /** 60-bit hash from the md5 hex prefix — identical in Spark and
    * DuckDB (hex cast). Non-negative, < 2^60. Spark side is the fused
    * codegen expression (md5 bytes → long, no hex-string round-trip —
    * see plans.Md5PrefixHash); bit-equivalence with the composed
    * `conv(substring(md5(x),1,15),16,10)` form is spec-pinned. */
  def hash60(c: Column): Column =
    GraftColumnBridge.column(Md5PrefixHash(GraftColumnBridge.expression(c), 15))
  def sqlHash60(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Deterministic train/val/test split: content-hash buckets with
    * single-sourced thresholds (80/10/10) — used by the standalone
    * split query (q56) AND the composed curation pipeline (q61), so
    * a ratio change cannot desynchronize them. */
  val SplitTrainPct = 80
  val SplitValPct = 90
  def splitAssign(docId: Column): Column = {
    val hk = hash60(docId.cast("string")) % 100
    when(hk < SplitTrainPct, "train")
      .when(hk < SplitValPct, "val")
      .otherwise("test")
  }
  /** DuckDB twin over a precomputed hash-bucket expression. */
  def sqlSplitCase(hk: String): String =
    s"CASE WHEN $hk < $SplitTrainPct THEN 'train' " +
      s"WHEN $hk < $SplitValPct THEN 'val' ELSE 'test' END"

  /** 32-bit variant for modular minhash arithmetic (a*h+b stays in
    * 63 bits). */
  def hash32(c: Column): Column =
    GraftColumnBridge.column(Md5PrefixHash(GraftColumnBridge.expression(c), 8))
  def sqlHash32(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** Language-ID: stopword-marker scoring. Deterministic, extensible
    * marker lists; ties break by list order. (The classic n-gram
    * profile approach needs reference profiles — marker scoring is the
    * degenerate-but-deterministic form of it.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "un", "est"),
    "es" -> Seq("el", "los", "y", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(ts, t => t.isInCollection(markers)))
    }
  }

  /** Predicted language: highest marker count, 'und' when all zero. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  def sqlLangScore(text: String, markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(${sqlTokens(text)}, t -> t IN ($set)))"
  }

  def sqlLangId(text: String): String = {
    val scores = langMarkers.map { case (l, m) => l -> sqlLangScore(text, m) }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    // same fold order as langId: first matching lang in list order wins
    scores.foldRight("'und'") { case ((lang, s), acc) =>
      s"CASE WHEN $s > 0 AND $s = $best THEN '$lang' ELSE $acc END"
    }
  }

  /** Quality-score components (heuristics from C4/Gopher-style
    * filtering, re-expressed as columns): length, mean word length,
    * alpha ratio, stopword ratio, digit ratio. */
  def tokenCount(text: Column): Column = size(tokens(text))
  def sqlTokenCount(text: String): String = s"len(${sqlTokens(text)})"

  def meanWordLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
      .otherwise(0.0)
  }
  def sqlMeanWordLen(text: String): String = {
    val ts = sqlTokens(text)
    s"""CASE WHEN len($ts) > 0
       | THEN list_sum(list_transform($ts, t -> length(t)))::DOUBLE / len($ts)
       | ELSE 0.0 END""".stripMargin
  }

  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double")
        / length(text)).otherwise(0.0)
  def sqlAlphaRatio(text: String): String =
    s"""CASE WHEN length($text) > 0
       | THEN (length($text) - length(regexp_replace($text, '[a-zA-Z]', '', 'g')))::DOUBLE
       |      / length($text)
       | ELSE 0.0 END""".stripMargin

  def stopwordRatio(text: Column): Column = {
    val sw = langMarkers.flatMap(_._2)
    val ts = tokens(text)
    when(size(ts) > 0,
      size(filter(ts, t => t.isInCollection(sw))).cast("double") / size(ts))
      .otherwise(0.0)
  }
  def sqlStopwordRatio(text: String): String = {
    val set = langMarkers.flatMap(_._2).map(m => s"'$m'").mkString(", ")
    val ts = sqlTokens(text)
    s"""CASE WHEN len($ts) > 0
       | THEN len(list_filter($ts, t -> t IN ($set)))::DOUBLE / len($ts)
       | ELSE 0.0 END""".stripMargin
  }

  /** Content fingerprint: md5 of normalized text (collapse whitespace,
    * lowercase) — exact-dedup key robust to formatting noise. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
  def sqlFingerprint(text: String): String =
    s"md5(lower(regexp_replace(trim($text), '\\s+', ' ', 'g')))"
}
