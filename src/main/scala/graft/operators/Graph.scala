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
}
