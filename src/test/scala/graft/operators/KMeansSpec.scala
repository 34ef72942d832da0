package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("inertia is non-increasing across training iterations") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (_, _, trace) = KMeans.fit(emb, k = 4, maxIter = 4)
    assert(trace.length == 4)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia rose: $trace")
    }
  }

  test("every vector is assigned to exactly one in-range cell") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (assigned, centroids, _) = KMeans.fit(emb, k = 4, maxIter = 2)
    assert(centroids.length == 4)
    val n = emb.count()
    assert(assigned.count() == n)
    assert(assigned.filter(col("cell") < 0 || col("cell") >= 4).isEmpty)
  }

  test("fit is deterministic across runs") {
    val emb = Tables.load(spark, sf, "embeddings")
    def run() = {
      val (a, c, t) = KMeans.fit(emb, k = 3, maxIter = 3)
      (a.select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1)))
        .toSet, c.map(_.toSeq).toSeq, t)
    }
    assert(run() == run())
  }
}
