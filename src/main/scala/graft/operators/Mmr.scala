package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-query greedy maximal-marginal-relevance selection as ONE typed
  * aggregation over the m-bounded candidate set.
  *
  * [[Similarity.mmrTopK]] unrolls the k greedy rounds as declarative
  * plan stages — per round an anti-join, a max-sim aggregation, a
  * window argmax, and a lineage cut. That shape is Catalyst-visible
  * but pays k barrier rounds of job latency on what is, after the
  * top-m cut, m rows per query (m = 8 for q100). This aggregator is
  * the fused form: the greedy loop runs in `finish()` over one
  * group's candidates, so the whole selection is a single
  * aggregation after candidate generation — no rounds, no m×m sims
  * table, no checkpoints. State is capped at m candidates per group
  * (insertion keeps the top m by (rel desc, id asc), the same
  * pruning [[Sampling.TopKByScore]] does), so partial aggregation
  * buffers stay model-sized at any corpus scale.
  *
  * Numeric parity with the unrolled form (spec-pinned equal): the
  * candidate ordering reuses TopKByScore's comparator semantics
  * (primitive `==` first so ±0.0 tie-break by id, then
  * `Double.compare` so NaN orders greatest); [[cosine]] is the
  * bit-twin of `plans.VectorExpressions.VecCosine.nullSafeEval`
  * (min-length fused left-to-right loop); every sim/score snaps with
  * [[Num.j]], the JVM twin of the r4 column snap; max-sim updates use
  * `Double.compare` (NaN greatest — Spark's `max` ordering); the
  * argmax tie-breaks (score desc, id asc) exactly like the window
  * rank it replaces.
  */
object Mmr {
  case class Cand(id: Long, rel: Double, vec: Array[Float])
  case class Pick(pick: Int, nbr_id: Long, score: Double)

  /** [[Sampling.betterByScore]] — the single-sourced comparator the
    * candidate cut must share with TopKByScore. */
  private def better(as: Double, ai: Long, bs: Double, bi: Long): Boolean =
    Sampling.betterByScore(as, ai, bs, bi)

  /** Bit-twin of VecCosine.nullSafeEval: one pass over the min-length
    * prefix, double accumulation, cos = dot/(√na·√nb). */
  private[operators] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  final class MmrGreedy(m: Int, k: Int, lam: Double)
      extends Aggregator[Cand, Seq[Cand], Seq[Pick]] {

    override def zero: Seq[Cand] = Seq.empty

    private def insert(buf: Seq[Cand], v: Cand): Seq[Cand] = {
      val merged = (v +: buf).sortWith((a, b) => better(a.rel, a.id, b.rel, b.id))
      if (merged.size > m) merged.take(m) else merged
    }

    override def reduce(buf: Seq[Cand], v: Cand): Seq[Cand] = insert(buf, v)
    override def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[Cand]): Seq[Pick] = {
      val cands = buf.toArray
      val n = cands.length
      val picked = new Array[Boolean](n)
      // max sim to the selected set so far; unused at pick 1
      val ms = new Array[Double](n)
      val out = Seq.newBuilder[Pick]
      val kEff = math.min(k, n)
      var j = 1
      while (j <= kEff) {
        var bi = -1; var bScore = 0.0
        var i = 0
        while (i < n) {
          if (!picked(i)) {
            val s =
              if (j == 1) Num.j(lam * cands(i).rel, 4)
              else Num.j(lam * cands(i).rel - (1.0 - lam) * ms(i), 4)
            if (bi == -1 || better(s, cands(i).id, bScore, cands(bi).id)) {
              bi = i; bScore = s
            }
          }
          i += 1
        }
        picked(bi) = true
        out += Pick(j, cands(bi).id, bScore)
        // fold the new pick into every survivor's running max-sim
        // (incremental max over a growing set ≡ the per-round
        // recomputed max(sim) aggregate); skipped after the final
        // pick — no round reads it
        if (j < kEff) {
          i = 0
          while (i < n) {
            if (!picked(i)) {
              val sim = Num.j(cosine(cands(i).vec, cands(bi).vec), 4)
              if (j == 1 || java.lang.Double.compare(sim, ms(i)) > 0) ms(i) = sim
            }
            i += 1
          }
        }
        j += 1
      }
      out.result()
    }

    override def bufferEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
    override def outputEncoder: Encoder[Seq[Pick]] = ExpressionEncoder[Seq[Pick]]()
  }

  /** Column form: greedy MMR picks (pick, nbr_id, score) per group from
    * (id, rel, vec) candidate rows. */
  def mmrGreedy(id: Column, rel: Column, vec: Column,
      m: Int, k: Int, lam: Double): Column =
    udaf(new MmrGreedy(m, k, lam), ExpressionEncoder[Cand]()).apply(id, rel, vec)
}
