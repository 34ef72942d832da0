package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch dimension loading (SURVEY.md §2.1 S3): the reference loads six
  * Olist CSVs producer-side with pandas (event_generator.py:47-69) and
  * never joins them in the streaming job (§1.1). Here they are proper
  * batch DataFrames with explicit schemas — never inferred (§1.3) — so
  * they can be broadcast-joined against streams or metrics.
  *
  * 100 TB note: dimension CSVs are small; read once, cache/broadcast.
  * Fact-scale CSV ingest should be converted to parquet at the edge —
  * `toParquet` does that conversion with column pruning preserved.
  */
object DimLoader {

  /** CSV with declared schema, header row, permissive-with-corrupt-drop
    * parse matching the event path's semantics. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(path)

  /** Edge conversion: CSV → parquet (columnar, splittable, pushdown). */
  def toParquet(spark: SparkSession, csvPath: String, schema: StructType,
      outPath: String): Unit =
    csv(spark, csvPath, schema).write.mode("overwrite").parquet(outPath)

  /** Parquet read with schema evolution (§2.13 absence): files written
    * under different schema versions merge into the union schema. */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
