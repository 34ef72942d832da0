package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch: estimates land within the theoretical error envelope,
  * the union composition law holds exactly, and sub-k supports are
  * counted exactly. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("distinct estimate within 4/√(k−2) of truth on a 20k-value support") {
    val df = (0 until 60000).map(i => s"user_${i % 20000}").toDF("u")
    val k = 256
    val est = Kmv.distinctEstimate(df, col("u"), k)
    val rel = math.abs(est - 20000.0) / 20000.0
    assert(rel < 4.0 / math.sqrt(k - 2.0), s"est=$est rel=$rel")
  }

  test("sub-k support is exact") {
    val df = (0 until 500).map(i => s"v_${i % 40}").toDF("u")
    assert(Kmv.distinctEstimate(df, col("u"), 64) == 40.0)
  }

  test("union composition law: merged synopses ≡ synopsis of the union") {
    val a = (0 until 5000).map(i => s"a_$i").toDF("u")
    val b = (2500 until 7500).map(i => s"a_$i").toDF("u")
    val k = 128
    val synA = Kmv.synopsis(a.select(Kmv.normHash(col("u"))), k)
    val synB = Kmv.synopsis(b.select(Kmv.normHash(col("u"))), k)
    val composed = Kmv.unionEstimate(synA, synB, k)
    val direct = Kmv.distinctEstimate(a.unionByName(b), col("u"), k)
    assert(composed == direct) // same bottom-k, bit-equal estimate
  }

  test("inclusion–exclusion intersection estimate tracks the true overlap") {
    val a = (0 until 8000).map(i => s"x_$i").toDF("u")
    val b = (4000 until 12000).map(i => s"x_$i").toDF("u")
    val k = 256
    val synA = Kmv.synopsis(a.select(Kmv.normHash(col("u"))), k)
    val synB = Kmv.synopsis(b.select(Kmv.normHash(col("u"))), k)
    val estI = Kmv.distinctEstimate(a, col("u"), k) +
      Kmv.distinctEstimate(b, col("u"), k) -
      Kmv.unionEstimate(synA, synB, k)
    // truth = 4000; inclusion–exclusion compounds three estimators'
    // error — allow a 3× envelope
    assert(math.abs(estI - 4000.0) / 4000.0 < 12.0 / math.sqrt(k - 2.0),
      s"estI=$estI")
  }
}
