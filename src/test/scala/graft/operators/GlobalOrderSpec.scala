package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass distributed rank equals the single-reducer window and
  * never plans an Exchange SinglePartition. */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("global pos ≡ row_number over the total order; contiguous 1..n") {
    val rnd = new scala.util.Random(7)
    val d = (1L to 997L).map(i => (i, rnd.nextLong())).toDF("id", "key")
    val got = GlobalOrder.withGlobalPos(d, numPartitions = 7,
        order = Seq(col("key"), col("id")))
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    val expected = d
      .withColumn("p", row_number().over(
        Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "p").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.values.toSeq.sorted == (1L to 997L))
  }

  test("plan has no SinglePartition exchange") {
    val d = (1L to 100L).map(i => (i, i * 37 % 100)).toDF("id", "key")
    val out = GlobalOrder.withGlobalPos(d, numPartitions = 4,
      order = Seq(col("key"), col("id")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(500))
    // ... while the naive window form does — the thing being avoided
    val naive = d.withColumn("p",
      row_number().over(Window.orderBy(col("key"), col("id"))))
    assert(naive.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("duplicate keys with a tie-breaker still yield a total order") {
    val d = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 1L)).toDF("id", "key")
    val got = GlobalOrder.withGlobalPos(d, numPartitions = 3,
        order = Seq(col("key"), col("id")))
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(got == Map(4L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L))
  }
}
