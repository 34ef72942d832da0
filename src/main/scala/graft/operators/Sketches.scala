package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.functions.TextFunctions._

/** Mergeable-sketch tier beyond HLL (q19) and KLL quantiles (q37b):
  * Count-Min for per-term frequency estimation over a corpus too large
  * to hold an exact term dictionary.
  *
  * 100 TB notes: `count_min_sketch` is an algebraic aggregate — each
  * partition folds its rows into a w×d counter array and the driver
  * merges ~numPartitions fixed-size sketches; nothing keyed ever
  * shuffles. The CMS guarantee is one-sided (estimate ≥ true count;
  * ≤ true + ε·N with probability 1−δ), which the spec asserts against
  * exact counts.
  */
object Sketches {

  val Eps = 0.001 // ε: over-estimate bound as a fraction of total mass
  val Conf = 0.99 // 1−δ
  val Seed = 42 // fixed → deterministic sketch bytes

  /** One-row DataFrame holding the serialized CMS over the corpus'
    * trigrams. */
  def trigramSketch(docs: DataFrame): DataFrame =
    docs
      .select(tokens(col("text")).as("toks"))
      .select(explode(shinglesFromTokens(col("toks"), 3)).as("g"))
      .agg(count_min_sketch(col("g"), lit(Eps), lit(Conf), lit(Seed)).as("cms"))

  /** Driver-side handle for point queries against the aggregated
    * sketch (the serving-side read path). */
  def readSketch(sketchRow: DataFrame): CountMinSketch =
    CountMinSketch.readFrom(sketchRow.head().getAs[Array[Byte]]("cms"))

  /** Bloom filter over a string column (distributed build via
    * df.stat — partials merge like any algebraic aggregate). */
  def bloomOf(df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  /** Probe column: true iff the value MIGHT be in the filter (never a
    * false negative). Runs inside whole-stage codegen with the bitset
    * as a plan reference object — see plans.BloomMightContain. */
  def mightContain(c: org.apache.spark.sql.Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.BloomMightContain(
        org.apache.spark.sql.GraftColumnBridge.expression(c), bloom))
}
