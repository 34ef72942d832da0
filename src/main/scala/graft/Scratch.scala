package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main — not part of the library (deleted before
  * round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    // warm
    docs.count()

    val edges = graft.operators.TextDedup.jaccardPairs(docs, n = 3, threshold = 0.5)
    val e0 = time("jaccardPairs materialize")(edges.localCheckpoint())
    println(s"[scratch] edges=${e0.count()} nodes=" +
      e0.select(col("id_a")).union(e0.select(col("id_b"))).distinct().count())

    time("cc warm")(graft.operators.ClusterDedup.connectedComponents(e0, "id_a", "id_b").count())
    time("cc run2")(graft.operators.ClusterDedup.connectedComponents(e0, "id_a", "id_b").count())
    time("full q36")(graft.queries.PipelineQueries.q36DedupClusters(spark, sfDir).count())
    spark.stop()
  }
}
