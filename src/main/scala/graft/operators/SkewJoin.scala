package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder brief: "salting for skew").
  *
  * AQE's skew-join handles most cases at runtime by splitting oversized
  * partitions; salting is the plan-level tool for the pathological case
  * AQE can't fix — a SINGLE key so hot that even one task per split
  * still hashes every probe row of that key to one reducer lineage, or
  * a non-sort-merge join AQE won't rewrite.
  *
  * Technique (standard): add salt ∈ [0, S) to the big side's key;
  * replicate the small side S× (explode over the salt range); join on
  * (key, salt). Hot-key work fans out over S reducers; the small side
  * grows S× — so keep S modest (8–32) and apply only to the hot keys
  * when they're known (`hotKeysOnly`).
  */
object SkewJoin {

  /** Full salted inner join: every big-side row gets a random-but-
    * deterministic salt (hash of a row id), the whole small side is
    * replicated `salts`×. */
  def salted(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSource: Column): DataFrame = {
    val b = big.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Targeted variant: only `hotKeys` are salted/replicated; the rest
    * join normally — small side stays ~1× and the hot keys still fan
    * out. */
  def saltedHotKeys(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltSource: Column, hotKeys: Seq[Any]): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val b = big.withColumn("_salt",
      when(isHot, pmod(hash(saltSource), lit(salts))).otherwise(lit(0)))
    val s = small.withColumn("_salt",
      explode(when(isHot, sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0)))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
