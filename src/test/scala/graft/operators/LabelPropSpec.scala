package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LabelProp round semantics: hop-per-round spread, majority with
  * deterministic tie-break, seed clamping, isolated nodes. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[(Long, Option[String])],
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Option[String]] =
    LabelProp.propagate(
        nodes.toDF("id", "seed"), edges.toDF("id_a", "id_b"), rounds)
      .collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("label")))
      .toMap

  test("labels spread one hop per round along a path") {
    val nodes = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, None))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val after1 = run(nodes, edges, 1)
    assert(after1(2L).contains("a") && after1(3L).isEmpty)
    val after3 = run(nodes, edges, 3)
    assert(after3 == Map(1L -> Some("a"), 2L -> Some("a"),
      3L -> Some("a"), 4L -> Some("a")))
  }

  test("majority wins; count ties break to the smaller label") {
    // node 10 has two 'b' neighbors and one 'a' → b
    // node 20 has one 'a' and one 'b' neighbor → tie → a
    val nodes = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("b")),
      (4L, Some("a")), (5L, Some("b")), (10L, None), (20L, None))
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L))
    val got = run(nodes, edges, 1)
    assert(got(10L).contains("b"))
    assert(got(20L).contains("a"))
  }

  test("seeds are clamped and isolated nodes stay unlabeled") {
    val nodes = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (9L, None))
    // node 2 is drowned in 'a' neighbors but keeps its seed
    val edges = Seq((2L, 1L), (2L, 3L))
    val got = run(nodes, edges, 2)
    assert(got(2L).contains("b"))
    assert(got(9L).isEmpty)
    // node 3's only neighbor is the clamped seed 2 → b
    assert(got(3L).contains("b"))
  }

  test("with-no-labeled-neighbor keeps the previous round's label") {
    // star: seed center, leaf u; second round u has only the center
    // (still labeled) — but a node connected ONLY to unlabeled nodes
    // must stay null across rounds
    val nodes = Seq((1L, Some("x")), (2L, None), (3L, None))
    val edges = Seq((1L, 2L), (3L, 2L))
    val r1 = run(nodes, edges, 1)
    assert(r1(2L).contains("x") && r1(3L).isEmpty)
    val r2 = run(nodes, edges, 2)
    assert(r2(3L).contains("x"))
  }
}
