package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkSpec

class DimLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("CSV dims load with declared schema; malformed rows dropped") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.write(java.nio.file.Paths.get(s"$dir/c.csv"),
      "customer_id,city,state\nc1,sao paulo,SP\nbad-row-only-one-col\nc2,rio,RJ\n".getBytes)
    val schema = StructType(Seq(
      StructField("customer_id", StringType),
      StructField("city", StringType),
      StructField("state", StringType)))
    val df = DimLoader.csv(spark, dir, schema)
    val rows = df.as[(String, String, String)].collect().sortBy(_._1)
    assert(rows.sameElements(Array(("c1", "sao paulo", "SP"), ("c2", "rio", "RJ"))))
  }

  test("parquet schema evolution merges columns across file versions") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq(("a", 1)).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq(("b", 2.5)).toDF("id", "v2").write.parquet(s"$dir/p=2")
    val merged = DimLoader.parquetMerged(spark, dir)
    assert(merged.columns.sorted.sameElements(Array("id", "p", "v1", "v2")))
    assert(merged.count() == 2)
  }
}
