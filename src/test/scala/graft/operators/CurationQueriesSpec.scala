package graft.operators

import graft.SparkSpec
import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Invariant checks for the round-5 curation queries (value-level
  * correctness is the DuckDB oracle's job — these pin structural
  * properties at sf0.001). */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q55 contamination ratios are in [0,1] and hits never exceed ngrams") {
    val df = CurationQueries.q55Contamination(spark, dir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("hits") > col("ngrams")).isEmpty)
    assert(df.filter(col("contamination") < 0 || col("contamination") > 1).isEmpty)
    // eval docs (hash bucket < EvalPct) must not be scored as train docs
    val scored = df.select(col("doc_id"))
    val evalIds = graft.Tables.load(spark, dir, "documents")
      .filter(graft.functions.TextFunctions.hash60(col("doc_id").cast("string")) % 100 < 5)
      .select(col("doc_id"))
    assert(scored.intersect(evalIds).isEmpty)
  }

  test("q55 eval-dictionary side is broadcast, not shuffled") {
    val plan = CurationQueries.q55Contamination(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q56 split counts partition the corpus") {
    val df = CurationQueries.q56SplitAssign(spark, dir).cache()
    val splits = df.select(col("split")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    val total = df.agg(sum(col("docs"))).head().getLong(0)
    assert(total == graft.Tables.load(spark, dir, "documents").count())
    // hash split is deterministic: two runs agree exactly
    val again = CurationQueries.q56SplitAssign(spark, dir)
    assert(df.except(again).isEmpty && again.except(df).isEmpty)
  }

  test("q57 quantization error is bounded by the int8 step size") {
    val rows = CurationQueries.q57EmbedQuantize(spark, dir).collect()
    assert(rows.nonEmpty)
    // the sound bound is per-vector: sse_i ≤ dims/4 · (maxabs_i/127)²,
    // so avg_sse ≤ dims/4 · avg(maxabs²). avg(maxabs²) is NOT
    // derivable from the query's avg_maxabs (Jensen) — recompute it
    // from the embeddings table per label.
    val maxabs2 = graft.Tables.load(spark, dir, "embeddings")
      .select(col("label"),
        array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          .as("maxabs"),
        size(col("embedding")).as("dims"))
      .filter(col("maxabs") > 0)
      .groupBy(col("label"))
      .agg(avg(col("maxabs") * col("maxabs")).as("avg_maxabs2"),
        max(col("dims")).as("dims"))
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Double]("avg_maxabs2"), r.getAs[Int]("dims"))).toMap
    rows.foreach { r =>
      val sse = r.getAs[Double]("avg_sse")
      val (am2, dims) = maxabs2(r.getAs[Int]("label"))
      assert(sse >= 0.0)
      assert(sse <= dims / 4.0 * am2 / (127.0 * 127.0) * 1.0001)
    }
  }

  test("curation pipeline stages shrink monotonically and dedup keeps first copies") {
    val raw = graft.Tables.load(spark, dir, "documents")
    val curated = CurationPipeline.curate(raw).cache()
    assert(curated.count() > 0 && curated.count() <= raw.count())
    // exact dedup: fingerprints unique, survivors are per-group minima
    val fps = curated.select(
      graft.functions.TextFunctions.fingerprint(col("clean")).as("fp"),
      col("doc_id"))
    assert(fps.groupBy(col("fp")).count().filter(col("count") > 1).isEmpty)
    // quality gate: all survivors meet the token floor
    assert(curated.filter(col("toks") < 20).isEmpty)
    // the single wide stage is the fingerprint shuffle: one Exchange
    // before the dedup window (plus the stats agg downstream)
    val plan = curated.queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("Exchange"))
    // re-curating the curated output is a no-op on membership
    val again = CurationPipeline.curate(
      curated.select(col("doc_id"), col("lang"), col("clean").as("text")))
    assert(again.count() == curated.count())
  }

  test("q62 repetition scores are consistent fractions") {
    val df = CurationQueries.q62Repetition(spark, dir).cache()
    assert(df.filter(col("distinct_trigrams") > col("trigrams")).isEmpty)
    assert(df.filter(col("dup_frac") < 0 || col("dup_frac") >= 1).isEmpty)
    // flagged docs really repeat: recomputing the fraction from the
    // reported counts matches the reported score
    assert(df.filter(
      graft.operators.Num.r4(lit(1.0) -
        col("distinct_trigrams").cast("double") / col("trigrams"))
        =!= col("dup_frac")).isEmpty)
  }

  test("q63 z-ranges are tight in BOTH dimensions (the point of z-ordering)") {
    val rows = CurationQueries.q63Zorder(spark, dir).collect()
    assert(rows.nonEmpty)
    // an aligned 16-code Morton block covers exactly a 4×4 tile of
    // (len_bucket, lang_code) space, so each range's bounding box can
    // spread at most 3 in EACH dimension — a single-dimension sort
    // cannot bound the other dimension at all
    rows.foreach { r =>
      assert(r.getAs[Long]("max_len_b") - r.getAs[Long]("min_len_b") <= 3)
      assert(r.getAs[Long]("max_lang_c") - r.getAs[Long]("min_lang_c") <= 3)
    }
  }

  test("q59 frame positions tile the payload at the stride") {
    val df = CurationQueries.q59FrameSample(spark, dir).cache()
    assert(df.count() > 0)
    // per doc: frame_idx is 0..n-1 dense, and n = ceil(bytes/16)
    val docsTbl = graft.Tables.load(spark, dir, "documents")
      .filter(length(col("text")) === octet_length(col("text")))
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), octet_length(col("text")).as("bytes"))
    val frames = df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_idx")).as("maxi"))
    val bad = frames.join(docsTbl, "doc_id")
      .filter(col("n") =!= ceil(col("bytes") / 16.0).cast("long") ||
        col("maxi") =!= col("n") - 1)
    assert(bad.isEmpty)
  }

  test("q60 checksum is bounded by out_len * max byte value") {
    val rows = CurationQueries.q60Resize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = r.getAs[Long]("checksum")
      assert(cs >= 0 && cs <= 64L * 255L)
    }
  }

  test("q58 emits exactly the head of every shard in deterministic order") {
    val df = CurationQueries.q58ShuffleShard(spark, dir).cache()
    val perShard = df.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), collect_list(col("pos")).as("ps"))
      .collect()
    assert(perShard.nonEmpty)
    perShard.foreach { r =>
      val n = r.getAs[Long]("n")
      val ps = r.getAs[scala.collection.Seq[Long]]("ps")
      assert(n <= 5 && ps.sorted == (1L to n).toSeq)
    }
    val again = CurationQueries.q58ShuffleShard(spark, dir)
    assert(df.except(again).isEmpty && again.except(df).isEmpty)
  }

  test("q128 quality gate: all-rules failures bound each rule; rates consistent") {
    val rows = CurationQueries.q128QualityGate(spark, dir).collect()
    val n = graft.Tables.load(spark, dir, "documents").count()
    val byRule = rows.map(r =>
      r.getAs[String]("rule") -> r.getAs[Long]("n_fail")).toMap
    val all = byRule("z_all_rules")
    // any single rule's failures are a subset of the any-rule failures,
    // and the union bound caps the total
    byRule.filterKeys(_ != "z_all_rules").values.foreach(f =>
      assert(f <= all))
    assert(all <= byRule.filterKeys(_ != "z_all_rules").values.sum)
    rows.foreach { r =>
      assert(r.getAs[Double]("fail_rate") ==
        Num.j(r.getAs[Long]("n_fail").toDouble / n, 4))
    }
  }

  test("q129 domain quota: kept = min(K, n_docs) per domain") {
    val rows = CurationQueries.q129DomainQuota(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(5L, n))
    }
  }

  test("q130 curation funnel: monotone survivors, stages reconcile with q127/q128") {
    val rows = CurationQueries.q130CurationFunnel(spark, dir).collect()
    val byStage = rows.map(r =>
      r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    val order = Seq("1_raw", "2_blocklist", "3_quality",
      "4_domain_quota", "5_dedup")
    assert(byStage.keySet == order.toSet)
    // a funnel only ever narrows
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(byStage(a) >= byStage(b), s"$a -> $b grew")
    }
    assert(byStage("1_raw") ==
      graft.Tables.load(spark, dir, "documents").count())
    // stage 2 must equal the q127 anti-join's kept total
    val kept127 = CurationQueries.q127HostBlocklist(spark, dir)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(byStage("2_blocklist") == kept127)
    // both windows in the plan are key-partitioned (domain / fp), and
    // the only SinglePartition hops are partial-agg merges
    val lines = CurationQueries.q130CurationFunnel(spark, dir)
      .queryExecution.executedPlan.toString.split("\n")
    lines.indices.filter(lines(_).contains("Exchange SinglePartition"))
      .foreach(i => assert(lines(i + 1).contains("partial_"),
        lines.slice(i, i + 2).mkString("\n")))
  }

  test("url host/domain extraction hand cases") {
    import spark.implicits._
    import graft.functions.UrlFunctions
    val got = Seq(
      "https://www.Example.COM/path?q=1",
      "http://user:pw@a.b.example.org:8080/x#f",
      "ftp://Files.example.net",
      "https://localhost/x",
      "not a url")
      .toDF("url")
      .select(UrlFunctions.host(col("url")).as("h"))
      .withColumn("d", UrlFunctions.registeredDomain(col("h")))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("www.example.com", "example.com"),
      ("a.b.example.org", "example.org"),
      ("files.example.net", "example.net"),
      ("localhost", "localhost"),
      ("", "")))
  }

  test("scoreAgainst: smoothed backoff for unseen bigrams, hand-computed") {
    import spark.implicits._
    // model corpus: one doc "x y x y" → tokens {x,y}, V=2,
    // c(x,y)=2, c(y,x)=1, c(x,·)=2, c(y,·)=1
    val model = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val (cab, ca, v) = LanguageModel.train(model)
    // scored doc "x y z": bigram (x,y) seen — (2+1)/(2+2);
    // (y,z) unseen with seen history y — (0+1)/(1+2)
    val got = LanguageModel.scoreAgainst(
      Seq((7L, "x y z")).toDF("doc_id", "text"), cab, ca, v)
      .as[(Long, Long, Double)].collect().toSeq
    val expect = Num.j(-(math.log(3.0 / 4) + math.log(1.0 / 3)) / 2, 4)
    assert(got == Seq((7L, 2L, expect)))
    // unseen history too: "z z" → uniform backoff (0+1)/(0+α·V) = 1/2
    val got2 = LanguageModel.scoreAgainst(
      Seq((8L, "z z")).toDF("doc_id", "text"), cab, ca, v)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got2 == Seq((8L, 1L, Num.j(-math.log(1.0 / 2), 4))))
  }

  test("q125 DSIR: weights favor target-like docs; sample size and ties") {
    val df = CurationQueries.q125DsirResample(spark, dir).cache()
    assert(df.count() == 10)
    assert(df.filter(col("w") <= 0).isEmpty)
    // importance weight must be monotone in the nll gap: recompute from
    // the emitted nlls and compare
    val bad = df.filter(
      abs(col("w") - greatest(
        graft.operators.Num.r(exp(col("nll_corpus") - col("nll_target")), 6),
        lit(1e-6))) > 1e-12)
    assert(bad.isEmpty)
    // and across the full corpus, the mean weight of target-language
    // docs exceeds the mean weight of the rest (the POINT of DSIR)
    import graft.operators.LanguageModel
    val d = graft.Tables.load(spark, dir, "documents")
    val (cabT, caT, vT) = LanguageModel.train(d.filter(col("lang") === "en"))
    val nllT = LanguageModel.scoreAgainst(d, cabT, caT, vT)
      .select(col("doc_id"), col("nll").as("nt"))
    val nllC = LanguageModel.scoreDocs(d)
      .select(col("doc_id"), col("nll").as("nc"))
    val w = nllC.join(nllT, Seq("doc_id"))
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), exp(col("nc") - col("nt")).as("w"))
    val Array(en, rest) = w
      .groupBy((col("lang") === "en").as("t")).agg(avg(col("w")).as("m"))
      .orderBy(col("t").desc).collect().map(_.getAs[Double]("m"))
    assert(en > rest)
  }

  test("q126/q127: rollup accounts for every doc; blocklist is a broadcast anti-join") {
    val total = graft.Tables.load(spark, dir, "documents").count()
    val roll = CurationQueries.q126HostRollup(spark, dir).cache()
    assert(roll.agg(sum(col("n_docs"))).head().getLong(0) == total)
    assert(roll.filter(col("dup_rate") < 0 || col("dup_rate") > 1).isEmpty)
    val kept = CurationQueries.q127HostBlocklist(spark, dir)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(kept < total && kept > 0)
    val plan = CurationQueries.q127HostBlocklist(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(600))
  }
}
