package graft.operators

import graft.SparkSpec

/** Auc vs the definitional pair count: AUC = (#concordant + ½·#tied)
  * / (n⁺·n⁻) over all positive×negative pairs — heavy score ties so
  * the midrank path is exercised. */
class AucSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[(Double, Int)]): Option[Double] = {
    val pos = xs.filter(_._2 == 1).map(_._1)
    val neg = xs.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else Some((for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size))
  }

  private def run(xs: Seq[(Double, Int)], parts: Int = 8): (Long, Long, Option[Double]) = {
    val r = Auc.auc(xs.toDF("score", "label"), "score", "label", parts).head()
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("perfect, random-ish, and inverted orderings") {
    assert(run(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))._3 === Some(1.0))
    assert(run(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)))._3 === Some(0.0))
    // all scores tied -> AUC exactly 0.5 by midrank
    assert(run(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)))._3 === Some(0.5))
  }

  test("equivalence vs pair counting on random tie-heavy scores") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3; parts <- Seq(2, 8)) {
      val xs = Seq.fill(150)(
        (rnd.nextInt(12) / 10.0, if (rnd.nextBoolean()) 1 else 0))
      val (np, nn, got) = run(xs, parts)
      assert(np === xs.count(_._2 == 1).toLong)
      assert(nn === xs.count(_._2 == 0).toLong)
      val want = brute(xs).get
      assert(math.abs(got.get - want) < 1e-6, s"trial=$trial got=$got want=$want")
    }
  }

  test("degenerate single-class input yields NULL auc") {
    assert(run(Seq((0.3, 1), (0.7, 1)))._3 === None)
  }
}
