package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import graft.plans.VectorFunctions.vec_dot

/** Product quantization: code determinism, the argmin optimality
  * invariant via reconstruction error, and ADC recall against exact
  * brute force. */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val cb = ProductQuantizer.train(emb, 8, 16)

  test("codebooks: 8 subspaces × 16 codewords of dim 8") {
    assert(cb.m == 8 && cb.k == 16 && cb.sub == 8)
    assert(cb.books.size == 8 && cb.books.forall(_.size == 16))
    assert(cb.books.forall(_.forall(_.length == 8)))
  }

  test("encode is deterministic and partitioning-independent") {
    def codesOf(parts: Int): Map[Long, Seq[Int]] =
      emb.repartition(parts)
        .select(col("vec_id"), ProductQuantizer.encode(col("embedding"), cb).as("c"))
        .as[(Long, Seq[Int])].collect().toMap
    val a = codesOf(1)
    val b = codesOf(7)
    assert(a == b && a.size == 500)
    assert(a.values.forall(c => c.size == 8 && c.forall(k => k >= 0 && k < 16)))
  }

  test("reconstruction error beats the degenerate all-code-0 quantizer") {
    // per-subspace argmin ⇒ per-vector error ≤ error under ANY fixed
    // code choice; strict on a real corpus
    def mse(codes: org.apache.spark.sql.Column): Double = {
      val r = ProductQuantizer.reconstruct(codes, cb)
      emb.select(
        (vec_dot(col("embedding"), col("embedding"))
          - lit(2.0) * vec_dot(col("embedding"), r)
          + vec_dot(r, r)).as("d2"))
        .agg(avg(col("d2"))).head().getDouble(0)
    }
    val pq = mse(ProductQuantizer.encode(col("embedding"), cb))
    val zeros = mse(typedLit(Seq.fill(8)(0)))
    assert(pq >= 0.0 && pq < zeros, s"pq=$pq zeros=$zeros")
  }

  test("ADC top-k recall vs brute force, stable under repartitioning") {
    val pred = col("vec_id") % 50 === 0
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      ProductQuantizer.adcTopK(df, cb, pred, 5, candN = 64)
        .select("query_id", "nbr_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = run(emb)
    assert(got.keySet == exact.keySet)
    val recall = exact.map { case (q, nbrs) =>
      got(q).intersect(nbrs).size.toDouble / nbrs.size
    }.sum / exact.size
    // measured 0.74 on this corpus (random embeddings — PQ's worst
    // case; no cluster structure for the codebooks to exploit)
    assert(recall >= 0.6, s"recall@5 = $recall")
    assert(run(emb.repartition(7)) == got)
  }

  test("IVF-PQ: probed candidates are a subset of the flat ADC scan's " +
      "cell-restricted corpus; results repartition-stable") {
    val pred = col("vec_id") % 50 === 0
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      ProductQuantizer.adcTopK(df, cb, pred, 5, candN = 64, nprobe = 4)
        .select("query_id", "nbr_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = run(emb)
    // same query set as the flat scan; every result must come from a
    // probed cell of its query (re-derive assignment + probes here)
    val nl = Similarity.deriveNlist(emb.count())
    val cent = Similarity.ivfCentroids(emb, nl)
    val assign = emb.select(col("vec_id"),
        array_max(Similarity.ivfCellArr(cent)(col("embedding")))
          .getField("cell").as("cell"))
      .as[(Long, Int)].collect().toMap
    val probed = emb.filter(pred).select(col("vec_id"),
        slice(sort_array(Similarity.ivfCellArr(cent)(col("embedding")),
          asc = false), 1, 4).getField("cell").as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(ivf.keySet == probed.keySet)
    ivf.foreach { case (q, nbrs) =>
      nbrs.foreach { n =>
        assert(probed(q).contains(assign(n)), s"q=$q nbr=$n not in probed cells")
      }
    }
    // recall vs exact top-5 (IVF restricts candidates; random
    // embeddings are the worst case — measured value pinned loosely)
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, nbrs) =>
      ivf(q).intersect(nbrs).size.toDouble / nbrs.size
    }.sum / exact.size
    assert(recall >= 0.2, s"ivf-pq recall@5 = $recall")
    assert(run(emb.repartition(7)) == ivf)
  }
}
