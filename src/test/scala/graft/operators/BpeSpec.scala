package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** BPE trainer: greedy merge semantics, determinism, compression, and
  * lossless decode. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: whole-token greedy left-to-right, no substring matches") {
    val df = Seq(
      Seq("a", "a", "a"), // overlapping pair → greedy: first two fuse
      Seq("xa", "b"), // 'a b' must NOT match inside 'xa b'
      Seq("a", "b", "c", "a", "b"), // two disjoint occurrences
      Seq.empty[String])
      .toDF("toks")
    val got = df.select(Bpe.applyMerge(col("toks"), "a", "b").as("m"))
      .as[Seq[String]].collect().toSeq
    val ab = "a" + Bpe.Joiner + "b"
    assert(got == Seq(
      Seq("a", "a", "a"), // pair (a,b) absent
      Seq("xa", "b"),
      Seq(ab, "c", ab),
      Seq.empty[String]))
    val aa = df.select(Bpe.applyMerge(col("toks"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(aa.head == Seq("a" + Bpe.Joiner + "a", "a"))
  }

  test("train on the corpus: deterministic merges, shrinking tokens, lossless decode") {
    val toks = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val before = toks.select(sum(size(col("toks")))).head().getLong(0)

    val (merges, merged) = Bpe.train(toks, 5)
    assert(merges.size == 5 && merges.distinct.size == 5)

    val (merges2, _) = Bpe.train(toks.repartition(7), 5)
    assert(merges2 == merges) // partitioning-independent

    val after = merged.select(sum(size(col("toks")))).head().getLong(0)
    assert(after < before, s"merges must compress: $before -> $after")

    // decode inverts every merge: token streams round-trip exactly
    val mismatches = merged
      .select(col("doc_id"), Bpe.decode(col("toks")).as("dec"))
      .join(toks.select(col("doc_id"), col("toks").as("orig")), Seq("doc_id"))
      .filter(not(col("dec") <=> col("orig")))
      .count()
    assert(mismatches == 0L)
  }
}
