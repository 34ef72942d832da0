package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over near-duplicate edge lists, beyond the
  * connected components in ClusterDedup: triangle enumeration — the
  * clustering-coefficient / cluster-density QC signal (a dedup
  * cluster whose edges form many triangles is a tight duplicate
  * group; a star of borderline pairs is not).
  *
  * Input contract: undirected edges as (id_a < id_b) — the canonical
  * orientation every pair generator here emits. With that ordering a
  * triangle a<b<c is enumerated exactly once as (a,b)+(b,c)+(a,c).
  *
  * 100 TB notes: two equi-joins on edge endpoints, shuffled by node
  * key. The classical scale refinement — orient each edge from its
  * lower-degree endpoint before joining, bounding wedge fan-out by
  * sqrt(m) — changes edge PREPARATION, not this operator's join
  * shape.
  */
object Graph {

  /** All triangles (a < b < c) of an (id_a < id_b) edge list. */
  def triangles(edges: DataFrame): DataFrame =
    edges.as("e1")
      .join(edges.as("e2"), col("e1.id_b") === col("e2.id_a"))
      .join(edges.as("e3"),
        col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b"))
      .select(col("e1.id_a").as("a"), col("e1.id_b").as("b"),
        col("e2.id_b").as("c"))

  /** Per-node triangle membership counts. */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("tri_cnt"))

  /** PageRank over an undirected (id_a < id_b) edge list — the
    * centrality QC signal over the near-dup graph (a high-rank node is
    * the "template" document its cluster orbits).
    *
    * Determinism contract (the operators.KMeans convention): each
    * round's ranks are snapped to 8 decimals before they feed the next
    * round, so an unrolled SQL twin computes bit-equal rounds from
    * identical inputs. Damping terms are built from literal arithmetic
    * (`1 − d` evaluated in doubles at runtime-equivalent precision),
    * never pre-folded decimals — `1 − 0.85` and a literal `0.15`
    * differ by one ulp.
    *
    * Scale: edges symmetrized once and checkpointed (each iteration
    * and both union branches would otherwise re-run the upstream pair
    * generation); per iteration one join keyed by source node + one
    * aggregation keyed by destination — both shuffle on node keys, so
    * a cluster reuses the same hash partitioning across rounds. In an
    * undirected graph every node has in-edges, so the aggregation
    * covers all nodes and no dangling-mass pass is needed. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("id_a"), col("id_b"))
      .unionByName(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint()
    val deg = sym.groupBy(col("id_a")).agg(count(lit(1)).as("deg"))
    val out = sym.join(deg, "id_a")
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("deg"))
      .localCheckpoint()
    val n = deg.count()
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = deg.select(col("id_a").as("node"),
      (lit(1.0) / lit(n.toDouble)).as("pr"))
    for (_ <- 1 to iters)
      pr = out.join(pr, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("m"))
        .select(col("node"),
          Num.r(base + lit(damping) * col("m"), 8).as("pr"))
    pr.join(deg.withColumnRenamed("id_a", "node"), "node")
      .select(col("node"), col("deg"), col("pr"))
  }
}
