package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ClusterDedup: connected components over near-dup edge lists. */
class ClusterDedupSpec extends SparkSpec {
  import spark.implicits._

  test("components of a chain, a triangle, and an isolated pair") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within maxIter via min propagation") {
    // path 0-1-2-...-9: min label 0 must travel 9 hops
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(edges, "id_a", "id_b", maxIter = 12)
      .as[(Long, Long)].collect()
    assert(got.length == 10 && got.forall(_._2 == 0L))
  }

  test("clusters attaches correct sizes") {
    val edges = Seq((5L, 6L), (6L, 7L), (30L, 31L)).toDF("id_a", "id_b")
    val got = ClusterDedup.clusters(edges, "id_a", "id_b")
      .select(col("cluster_id"), col("id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((5L, 5L, 3L), (5L, 6L, 3L), (5L, 7L, 3L),
      (30L, 30L, 2L), (30L, 31L, 2L)))
  }

  test("edge direction does not matter") {
    val a = ClusterDedup.connectedComponents(
      Seq((2L, 1L), (3L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(a == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
