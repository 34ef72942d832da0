package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-provided deterministic parquet testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table under a
  * scale-factor directory.
  *
  * At 100 TB these would be partitioned parquet/iceberg tables; the
  * access pattern (read → Catalyst pushdown of filters/projections
  * into the scan) is identical, so every query in this repo keeps its
  * plan shape under partitioned inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark 4 refuses to
    // read as a timestamp; read nanos as long and convert exactly
    // (integer division — no double round-trip) to a µs timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
