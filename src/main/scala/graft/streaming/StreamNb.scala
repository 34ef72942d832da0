package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{NaiveBayes, Num}

/** Deploy half of the Gaussian-NB train→deploy loop
  * (operators.NaiveBayes trains offline; this classifies an embedding
  * stream at ingestion). The trained model — per-(label, dim) mean /
  * variance / normalization plus log priors — is bounded state
  * (labels × dims doubles), so it rides the plan as ARRAY LITERALS
  * and scoring becomes a pure projection: a fixed left-to-right fold
  * over the embedding array per candidate label, then a struct-max
  * argmax. No aggregation, no watermark, no state store — the
  * streaming plan is stateless and composes anywhere.
  *
  * Batch equivalence: the fold applies the identical r8-snapped
  * per-dimension contributions and r4-snapped final score the batch
  * scorer uses; the fold's fixed summation order differs from the
  * batch aggregation's only below the final snap (spec-pinned
  * bit-equality).
  */
object StreamNb {

  /** Trained model as driver-side literals: (label, lp0, m, var, c0)
    * per class, ordered by label. */
  def collectModel(stats: DataFrame, priors: DataFrame)
      : Seq[(Int, Double, Array[Double], Array[Double], Array[Double])] = {
    val byLabel = stats.orderBy(col("label"), col("pos"))
      .select(col("label"), col("m"), col("var"), col("c0"))
      .collect()
      .groupBy(_.getInt(0)).map { case (l, rows) =>
        (l, rows.map(_.getDouble(1)), rows.map(_.getDouble(2)),
          rows.map(_.getDouble(3)))
      }
    val lp = priors.collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    byLabel.toSeq.sortBy(_._1).map { case (l, m, v, c0) =>
      (l, lp(l), m, v, c0)
    }
  }

  /** Append (pred, score) to a stream (or batch frame) carrying an
    * `embedding` array column. Per-class scoring runs through the
    * codegen [[graft.plans.VecGaussScore]] fold (the equivalent
    * `transform` + `aggregate` HOF chain is CodegenFallback — an
    * interpreted lambda tree plus a temp array per scored row). */
  def classified(stream: DataFrame,
      model: Seq[(Int, Double, Array[Double], Array[Double], Array[Double])])
      : DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val emb = col("embedding")
    val scoreStructs: Seq[Column] = model.map { case (lbl, lp0, m, v, c0) =>
      val fold = GraftColumnBridge.column(graft.plans.VecGaussScore(
        GraftColumnBridge.expression(emb),
        m.toIndexedSeq, v.toIndexedSeq, c0.toIndexedSeq))
      struct(Num.r4(lit(lp0) + fold).as("score"), lit(-lbl).as("negc"))
    }
    val best = array_max(array(scoreStructs: _*))
    stream
      .withColumn("pred", (-best.getField("negc")).cast("int"))
      .withColumn("score", best.getField("score"))
  }

  /** Convenience: train on a static frame, return the scoring
    * function for streams. */
  def trainedClassifier(train: DataFrame)
      : DataFrame => DataFrame = {
    val model = collectModel(NaiveBayes.gaussStats(train),
      NaiveBayes.logPriors(train))
    classified(_, model)
  }
}
