package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = Seq.tabulate(1000)(i =>
    (if (i < 900) "hot" else s"k${i % 17}", i.toLong))
    .toDF("key", "v")
  private val small = Seq(("hot", 1), ("k1", 2), ("k2", 3)).toDF("key", "w")

  test("salted join returns exactly the plain-join rows") {
    val plain = big.join(small, Seq("key"))
      .select("key", "v", "w").as[(String, Long, Int)].collect().sorted
    val salted = SkewJoin.salted(big, small, "key", salts = 8,
      saltSource = col("v"))
      .select("key", "v", "w").as[(String, Long, Int)].collect().sorted
    assert(plain.sameElements(salted))
  }

  test("hot-key-targeted salting also preserves join results") {
    val plain = big.join(small, Seq("key"))
      .select("key", "v", "w").as[(String, Long, Int)].collect().sorted
    val salted = SkewJoin.saltedHotKeys(big, small, "key", salts = 8,
      saltSource = col("v"), hotKeys = Seq("hot"))
      .select("key", "v", "w").as[(String, Long, Int)].collect().sorted
    assert(plain.sameElements(salted))
  }

  test("salting spreads the hot key over multiple salt values") {
    val saltsUsed = big.filter($"key" === "hot")
      .withColumn("_salt", pmod(hash($"v"), lit(8)))
      .select(countDistinct($"_salt")).as[Long].collect().head
    assert(saltsUsed == 8)
  }
}
