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

  test("deep chain converges in O(log n) rounds, not O(diameter)") {
    // path 0-1-...-300: diameter 300 — min-label propagation would
    // need 300 rounds; large-star/small-star finishes well within 12.
    // localFinishEdges = 0 forces the distributed path (the default
    // would resolve a graph this small driver-side).
    val edges = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(edges, "id_a", "id_b",
      maxIter = 12, localFinishEdges = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == 301 && got.forall(_._2 == 0L))
  }

  test("unconverged maxIter throws instead of returning wrong labels") {
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      ClusterDedup.connectedComponents(edges, "id_a", "id_b",
        maxIter = 1, localFinishEdges = 0L)
    }
  }

  test("driver-side local finish matches the distributed rounds exactly") {
    // pseudo-random sparse graph: chains, merges, hubs, self-loops
    val edges = (0L until 400L).map { i =>
      val a = (i * 2654435761L) % 97L
      val b = (i * 40503L + 7L) % 97L
      (a, b)
    }.toDF("id_a", "id_b")
    val local = ClusterDedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val dist = ClusterDedup.connectedComponents(edges, "id_a", "id_b",
      localFinishEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(local == dist)
  }

  test("high-degree hub with reversed ids resolves to the hub min") {
    // star around 100 with leaves 101..140 plus bridge 100-7:
    // component min is 7, reachable only through the hub
    val edges = ((101L to 140L).map(l => (100L, l)) :+ (100L, 7L))
      .toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == 42 && got.forall(_._2 == 7L))
  }

  test("self-loop-only node gets a singleton label") {
    val edges = Seq((1L, 2L), (9L, 9L)).toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
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
