package graft.operators

import graft.SparkSpec

/** Skyline vs the definitional brute force on random points — dense
  * ties on both coordinates so the strictness clauses and the
  * equal-x / equal-y regimes are exercised. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Int, Int)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Int, Int)], parts: Int = 8): Set[Long] =
    Skyline.frontier(pts.toDF("id", "x", "y"), "x", "y", parts)
      .select("id").as[Long].collect().toSet

  test("hand case: ties on price and size both stay") {
    //            id  x  y
    val pts = Seq((1L, 1, 5), (2L, 1, 5), // tied pair, both frontier
      (3L, 1, 4),                         // same x, smaller y → dominated
      (4L, 2, 6), (5L, 2, 5),             // 5 dominated by 1 (cheaper, = y)
      (6L, 3, 7), (7L, 3, 6))             // 7 dominated by 6 (same x)
    assert(run(pts) === Set(1L, 2L, 4L, 6L))
    assert(run(pts) === brute(pts))
  }

  test("equivalence vs brute force on random points") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3; parts <- Seq(2, 8)) {
      val pts = (1L to 120L).map(id =>
        (id, rnd.nextInt(12), rnd.nextInt(12)))
      assert(run(pts, parts) === brute(pts), s"trial=$trial parts=$parts")
    }
  }

  test("monotone tradeoff chain: every point on the frontier") {
    // paying more always buys more: nothing dominates anything
    val pts = (1L to 20L).map(id => (id, id.toInt, id.toInt))
    assert(run(pts) === pts.map(_._1).toSet)
  }
}
