package graft.operators

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Invariant checks for the round-2 pipeline queries (value-level
  * correctness is the DuckDB oracle's job — these pin structural
  * properties at sf0.001). */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q36 cluster ids are the minimum member id") {
    val df = PipelineQueries.q36DedupClusters(spark, dir).cache()
    assert(df.filter(col("cluster_id") > col("doc_id")).isEmpty)
    // every cluster id is itself a member of the cluster
    val heads = df.select(col("cluster_id")).distinct()
    val members = df.select(col("doc_id"))
    assert(heads.except(members).isEmpty)
    // sizes agree with the actual membership counts
    val bad = df.groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") =!= col("cluster_size"))
    assert(bad.isEmpty)
  }

  test("q37 quantiles are monotone and bracketed by min/max") {
    val rows = PipelineQueries.q37Quantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25", "p50", "p75", "p95").map(c => r.getAs[Double](c))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  test("q37b approx median is within the rank-error bound of exact") {
    val rows = PipelineQueries.q37bApproxQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"sketch estimate out of rank bound for ${r.get(0)}")
      assert(r.getAs[Double]("p50_exact") > 0.0)
    }
  }

  test("q39 hash sample keeps roughly SamplePct of rows") {
    val total = graft.Tables.load(spark, dir, "lineitem").count()
    val sampled = PipelineQueries.q39HashSample(spark, dir)
      .agg(sum(col("sample_rows"))).collect()(0).getLong(0)
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sample fraction $frac")
  }

  test("q40 scrub finds and replaces entities in the corpus") {
    val rows = PipelineQueries.q40Scrub(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("entities_found")).sum > 0)
    // '<ENT>' (5 chars) replacing 'spark'(5)/'customer'(8) never grows
    rows.foreach { r =>
      assert(r.getAs[Long]("chars_after") <= r.getAs[Long]("chars_before"))
    }
  }

  test("q35 levenshtein pairs are symmetric-free and ordered") {
    val df = PipelineQueries.q35Levenshtein(spark, dir)
    assert(df.filter(col("id_a") >= col("id_b")).isEmpty)
  }

  test("q41 centroid components stay within embedding range") {
    val df = PipelineQueries.q41Centroids(spark, dir)
    val mm = graft.Tables.load(spark, dir, "embeddings")
      .select(explode(col("embedding")).as("x"))
      .agg(min(col("x")).cast("double"), max(col("x")).cast("double"))
      .collect()(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    assert(df.filter(col("centroid") < lo || col("centroid") > hi).isEmpty)
  }

  test("q53 chunks cover every token at least once") {
    val chunks = PipelineQueries.q53Chunking(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(col("chunk_tokens")).as("covered"))
    val toks = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n"))
    // overlapping windows: total chunk tokens >= doc tokens
    val short = chunks.join(toks, "doc_id").filter(col("covered") < col("n"))
    assert(short.isEmpty)
  }

  test("q54 bins respect the running-total budget layout") {
    val bins = PipelineQueries.q54Packing(spark, dir).collect()
    assert(bins.nonEmpty)
    // bin ids per lang are dense from 0
    bins.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
  }
}
