package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gaussian Naive Bayes over embedding columns — the counting-based
  * classifier complement to [[LogisticGd]]: model fitting is ONE
  * aggregation pass (per-class/per-dimension mean and variance are
  * sufficient statistics), so unlike gradient training there are no
  * rounds to unroll and the whole train→score loop stays a two-job
  * plan. The classic cheap quality/topic router for corpus curation
  * when labels exist.
  *
  * Cross-engine exactness (the strict oracle gate): every libm call
  * (ln) and every aggregate output is snapped to 8 decimals with
  * [[Num.r]] before entering downstream arithmetic, dot-product-free
  * scoring keeps a fixed expression tree, and the per-dimension score
  * contributions are snapped BEFORE the final sum so summation order
  * (Spark partial aggregation vs DuckDB serial) cannot leak past the
  * final 4-decimal snap.
  *
  * Scale shape (100 TB): training explodes vectors to (label, dim, x)
  * rows — a narrow generator feeding one map-side-combined
  * aggregation; the model is labels × dims rows (bounded state, here
  * 640) which broadcasts; scoring is a broadcast join plus one keyed
  * aggregation per (vector, label). No all-pairs anywhere, no
  * driver-side loops.
  */
object NaiveBayes {

  /** Variance floor: a dimension constant within a class would give
    * var = 0 and an infinite density; the floor is applied identically
    * in the DuckDB twin. */
  val VarFloor = 1e-6

  /** 2π as an exact double literal — spelled the same in the SQL twin
    * so both engines feed ln() the identical argument. */
  val TwoPi = 6.283185307179586

  /** Per-(label, pos) Gaussian stats over `emb.embedding[pos]`:
    * columns (label, pos, m, var, c0) where c0 = −½·ln(2π·var) is the
    * normalization term precomputed at model time. All snapped r8. */
  def gaussStats(emb: DataFrame): DataFrame = {
    val exploded = emb.select(col("label"),
      posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("label"), col("pos"), col("xf").cast("double").as("x"))
    val raw = exploded.groupBy(col("label"), col("pos"))
      .agg(Num.r(avg(col("x")), 8).as("m"),
        Num.r(avg(col("x") * col("x")), 8).as("m2"))
    raw
      .withColumn("var",
        Num.r(greatest(col("m2") - col("m") * col("m"), lit(VarFloor)), 8))
      .withColumn("c0", Num.r(lit(-0.5) * log(lit(TwoPi) * col("var")), 8))
      .select(col("label"), col("pos"), col("m"), col("var"), col("c0"))
  }

  /** Per-label snapped log prior: (label, lp0). */
  def logPriors(emb: DataFrame): DataFrame = {
    val cnts = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("tot"))
    cnts.crossJoin(broadcast(tot))
      .select(col("label"),
        Num.r(log(col("cnt").cast("double") / col("tot")), 8).as("lp0"))
  }

  /** Per-(vector, candidate label) log joint score, snapped r4:
    * lp0 + Σ_pos [c0 − (x−m)²/(2·var)] with each contribution snapped
    * r8 pre-sum. `test` needs (vec_id, label, embedding); the true
    * label rides along as `label_true`. */
  def scores(test: DataFrame, stats: DataFrame, priors: DataFrame): DataFrame = {
    val tex = test.select(col("vec_id"), col("label").as("label_true"),
      posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("label_true"), col("pos"),
        col("xf").cast("double").as("x"))
    val st = broadcast(stats.withColumnRenamed("label", "cand"))
    val contrib = tex.join(st, "pos")
      .select(col("vec_id"), col("label_true"), col("cand"),
        Num.r(col("c0") -
          (col("x") - col("m")) * (col("x") - col("m")) /
            (lit(2.0) * col("var")), 8).as("contrib"))
    contrib.groupBy(col("vec_id"), col("label_true"), col("cand"))
      .agg(sum(col("contrib")).as("s"))
      .join(broadcast(priors.withColumnRenamed("label", "cand")), "cand")
      .select(col("vec_id"), col("label_true"), col("cand"),
        Num.r4(col("lp0") + col("s")).as("score"))
  }

  /** Argmax over candidate labels: highest snapped score, ties to the
    * smallest label — one struct-max aggregation, no window. */
  def predict(scored: DataFrame): DataFrame =
    scored.groupBy(col("vec_id"), col("label_true"))
      .agg(max(struct(col("score"), (-col("cand")).as("negc"))).as("best"))
      .select(col("vec_id"), col("label_true"),
        (-col("best.negc")).cast("int").as("pred"),
        col("best.score").as("score"))
}
