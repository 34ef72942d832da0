package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** TokenWindows generator: streaming 1 → N chunking, pinned to the
  * compositional posexplode(sequence)+slice form q53 uses. */
class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  private val chunkSize = 40
  private val stride = 30

  private def viaGenerator(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        GraftColumnBridge.column(TokenWindows(
          GraftColumnBridge.expression(col("toks")), chunkSize, stride)))
      .toDF("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))

  private def viaComposition(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(chunkSize)))
          .as("chunk_text"))

  test("generator output equals the compositional form on the corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = viaGenerator(docs)
    val b = viaComposition(docs)
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("empty and null token arrays match the sequence(1, greatest(len,1)) edge") {
    val df = Seq((1L, Some("")), (2L, Some("one two")), (3L, None))
      .toDF("doc_id", "text")
    val a = viaGenerator(df).collect().toSet
    val b = viaComposition(df).collect().toSet
    // empty tokens -> one empty chunk in both forms
    assert(a.exists(r => r.getLong(0) == 1L && r.getString(2) == ""))
    // NULL input: the generator follows Spark's explode(null) -> no
    // rows convention; the compositional form's greatest(size(null),1)
    // coerces null to one empty chunk. Documented divergence — both
    // asserted so a change in either surfaces here.
    assert(!a.exists(_.getLong(0) == 3L))
    assert(b.exists(r => r.getLong(0) == 3L && r.getString(2) == ""))
    assert(a.filter(_.getLong(0) != 3L) == b.filter(_.getLong(0) != 3L))
  }

  test("plans as a Generate node over the scan (no intermediate arrays)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = viaGenerator(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Generate token_windows"))
  }
}
