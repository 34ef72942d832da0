package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Count-Min sketch: one-sided error guarantee checked against exact
  * trigram counts on the corpus. */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CMS estimates dominate exact counts and stay within eps * total") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val cms = Sketches.readSketch(Sketches.trigramSketch(docs))
    val exact = docs
      .select(TF.tokens(col("text")).as("toks"))
      .select(explode(TF.shinglesFromTokens(col("toks"), 3)).as("g"))
      .groupBy(col("g")).count()
      .orderBy(col("count").desc, col("g"))
      .limit(50)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val total = cms.totalCount()
    exact.foreach { case (term, n) =>
      val est = cms.estimateCount(term)
      assert(est >= n, s"CMS must never under-count: $term est=$est exact=$n")
      assert(est <= n + (Sketches.Eps * total).toLong,
        s"over-estimate beyond eps*N: $term est=$est exact=$n total=$total")
    }
  }

  test("bloom probe: zero false negatives, bounded false positives, codegen'd") {
    val docs = graft.Tables.load(spark, dir, "documents")
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    // "eval set" = 20% of fingerprints; filter the rest through the bloom
    val evalSet = docs.filter(col("doc_id") % 5 === 0)
    val bloom = Sketches.bloomOf(evalSet, "fp", expectedItems = 1000, fpp = 0.01)
    // no false negatives: every eval fingerprint must probe true
    assert(evalSet.filter(!Sketches.mightContain(col("fp"), bloom)).isEmpty)
    // bounded false positives on definite non-members (distinct keys)
    val nonMembers = docs.filter(col("doc_id") % 5 =!= 0)
      .join(evalSet.select(col("fp")), Seq("fp"), "left_anti")
    val n = nonMembers.count()
    val falsePos = nonMembers.filter(Sketches.mightContain(col("fp"), bloom)).count()
    assert(n > 0 && falsePos.toDouble / n <= 0.05)
    // the probe runs inside a WholeStageCodegen span
    val plan = docs.filter(Sketches.mightContain(col("fp"), bloom))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain") && plan.contains("*("))
  }

  test("incremental dedup: bloom prefilter + exact confirm ≡ full anti-join") {
    import spark.implicits._
    // the snapshot-maintenance pattern at 100 TB: probe the new batch
    // against the HISTORY's bloom (O(bits) broadcast, no join for the
    // definite-new rows); only the maybe-set pays the exact anti-join
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val history = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val bloom = Sketches.bloomOf(history, "fp", expectedItems = 1000, fpp = 0.03)
    val definitelyNew = batch.filter(!Sketches.mightContain(col("fp"), bloom))
    val confirmedNew = batch.filter(Sketches.mightContain(col("fp"), bloom))
      .join(history.select("fp"), Seq("fp"), "left_anti")
    val got = definitelyNew.select("doc_id")
      .unionByName(confirmedNew.select("doc_id")).as[Long].collect().toSet
    val expected = batch.join(history.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("sketch is deterministic and mergeable across partitionings") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val a = Sketches.readSketch(Sketches.trigramSketch(docs))
    val b = Sketches.readSketch(Sketches.trigramSketch(docs.repartition(7)))
    // same seed + same data => identical counters regardless of how
    // partial sketches were folded and merged
    assert(a.totalCount() == b.totalCount())
    val probe = docs
      .select(TF.tokens(col("text")).as("toks"))
      .select(explode(TF.shinglesFromTokens(col("toks"), 3)).as("g"))
      .limit(100).collect().map(_.getString(0))
    probe.foreach { t =>
      assert(a.estimateCount(t) == b.estimateCount(t))
    }
  }
}
