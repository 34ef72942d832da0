package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: connected components over a candidate-
  * pair edge list (e.g. MinHash-LSH or Jaccard pairs), assigning every
  * document the minimum doc id reachable through near-dup edges as its
  * cluster id. This is the step a training-data pipeline runs after
  * pair generation — keep one representative per cluster, not per pair
  * (pairs alone under-dedup transitive chains A~B~C).
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes min(own label, neighbors' labels); converges in O(diameter)
  * rounds. Near-dup clusters are shallow (duplicates of a common
  * ancestor), so diameter is small in practice; `maxIter` bounds the
  * loop regardless.
  *
  * 100 TB notes: the driver only coordinates rounds (same control
  * model as GraphX/Pregel); all data movement is distributed joins on
  * node ids. Each round is one shuffle of the (still-shrinking) label
  * table against the edge list; `localCheckpoint` truncates lineage so
  * round N doesn't re-execute rounds 1..N-1, and the early-exit check
  * reads one boolean per round. Edge lists from LSH are O(candidates),
  * never O(n²).
  */
object ClusterDedup {

  /** Connected components over an undirected edge list.
    * Returns (id, cluster_id) for every node appearing in `edges`. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // materialize the edge pipeline ONCE before the symmetric union —
    // both union branches would otherwise re-execute it
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .localCheckpoint()
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val nbrMin = sym.join(labels, sym("d") === labels("id"))
        .groupBy(col("s")).agg(min(col("lbl")).as("nbr_lbl"))
      // carry a changed flag through the same pass (labels only ever
      // decrease), lazily checkpointed so ONE action per round both
      // materializes the new labels and reads the convergence count
      val next = labels.join(nbrMin, labels("id") === nbrMin("s"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("new_lbl"),
          (coalesce(col("nbr_lbl"), col("lbl")) < col("lbl")).as("changed"))
        .localCheckpoint(false)
      val changed = next.agg(sum(when(col("changed"), 1L).otherwise(0L)))
        .collect()(0).getLong(0) > 0
      labels = next.select(col("id"), col("new_lbl").as("lbl"))
      done = !changed
      i += 1
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Cluster assignment with sizes: (cluster_id, id, cluster_size),
    * one row per clustered document. */
  def clusters(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol)
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
  }
}
