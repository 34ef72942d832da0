package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink formats beyond parquet+CSV+JSON: the JDBC relation
  * (the reference's serving-DB surface) exercised against embedded
  * Derby — a real database, not SQL-text mocks — and ORC.
  *
  * Scale notes: the partitioned JDBC read is the parallel-ingest path
  * (N executors each open a range-bounded cursor); filter pushdown
  * moves predicates into the database before rows cross the wire.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft-derby").toString)
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()

  test("jdbc write + partitioned parallel read round-trips") {
    val df = (1L to 1000L).map(i => (i, s"v$i", (i % 7).toInt))
      .toDF("id", "v", "grp")
    df.write.mode("overwrite")
      .jdbc(url, "roundtrip", props)
    val back = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "roundtrip")
      .option("partitionColumn", "id")
      .option("lowerBound", "1")
      .option("upperBound", "1000")
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    assert(back.as[(Long, String, Int)].collect().toSet ==
      df.as[(Long, String, Int)].collect().toSet)
  }

  test("jdbc filter and column pruning are pushed into the database") {
    (1L to 100L).map(i => (i, i * 2)).toDF("k", "dbl")
      .write.mode("overwrite").jdbc(url, "pushdown", props)
    val q = spark.read.jdbc(url, "pushdown", props)
      .filter(col("k") > 90).select(col("k"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("k"))
    assert(q.count() == 10)
  }

  test("orc write/read round-trips with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("orc"))
    assert(back.count() ==
      docs.filter(col("lang") === "en").count())
  }
}
