package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Inventory-wide plan-shape gate: compiles EVERY SparkEntry query and
  * walks its physical plan for the scale anti-patterns the per-query
  * PlanSpec pins catch only for the ~30 pinned queries:
  *
  *  - `CartesianProductExec` anywhere — never acceptable;
  *  - `BroadcastNestedLoopJoinExec` that is neither of the two benign
  *    shapes: (a) `Cross` with no condition — the scalar-summary
  *    crossJoin against a one-row aggregate; (b) a build side that is
  *    a `LocalTableScan` — a driver-built model table (centroids,
  *    codebooks, tile indexes) of k rows by construction;
  *  - `Exchange SinglePartition` whose child is not the partial side
  *    of a grand (keyless) aggregate — a data-bearing one-reducer
  *    funnel;
  *  - plus anything in ALLOWED must still match its recorded pattern —
  *    an allowlist entry names the one condition fragment that
  *    justifies it, so a silently changed plan re-fails the gate.
  *
  * Prints one JSON line per offending query and a summary line; exit 1
  * on any violation. Run: `runMain graft.PlanGate [sfDir]`. Static —
  * nothing executes; the 189-query inventory gates in ~70 s.
  */
object PlanGate {

  /** Data-conditioned BNLJ that are correct by row-count arguments the
    * plan cannot carry: query name -> (required condition substring,
    * justification). The substring must appear in the BNLJ condition
    * for the exemption to hold. */
  private[graft] val Allowed: Map[String, (String, String)] = Map(
    "q27_cosine_topk" -> ("query_id", "query set broadcast vs corpus: brute-force exact anchor (Similarity.bruteForceTopK doc)"),
    "q100_mmr_topk" -> ("query_id", "query set broadcast vs corpus (MMR re-rank rides q27's anchor shape)"),
    "q68_pq_adc" -> ("query_id", "query set broadcast: ADC re-rank joins k-row candidate lists"),
    "q97_hard_negatives" -> ("query_id", "query set broadcast vs corpus band filter"),
    "q28_cosine_pairs" -> ("veccosine", "THE documented all-pairs exact oracle anchor (scale path = cosinePairsBlocked)"),
    "q113_source_overlap" -> ("sa", "source-domain self-pairs: |distinct sources| rows per side"),
    "q119_interval_overlap" -> ("avgc", "hourly histogram vs one-row global average"),
    "q153_edit_join" -> ("levenshtein", "short-string branch: both sides len <= q(k-1)+1, alphabet-bounded (EditDistanceJoin doc)"),
    "q161_sliding_distinct" -> ("datediff", "day-anchor range join: aggregated (day) frames, ~30 rows/side"),
    "q183_incremental_pairs" -> ("bv#", "arriving micro-batch broadcast vs one corpus scan (Similarity.incrementalPairs contract)"))

  /** SinglePartition exchanges that carry a bounded post-aggregation
    * frame (one row per small group domain) into an unpartitioned
    * window: query name -> (required grouping-key fragment in the
    * child aggregate, justification). */
  private[graft] val AllowedFunnel: Map[String, (String, String)] = Map(
    "q84_temperature_mix" -> ("source", "mixture window over the per-source aggregate: |sources| rows"),
    "q99_mix_plan" -> ("lang", "mix-plan window over the per-lang token aggregate: |langs| rows"),
    "q103_epoch_expand" -> ("lang", "epoch quota window over the per-lang aggregate: |langs| rows"))

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    // the AQE wrapper is a leaf node — its plan hangs off a field
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case _ => (p +: p.children.flatMap(walk)) ++ p.subqueries.flatMap(walk)
  }

  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter => strip(i.child)
    case r: ReusedExchangeExec => r // broadcast reuse: original not reachable
    case e: exchange.BroadcastExchangeExec => strip(e.child)
    case other => other
  }

  private def isScalarMerge(child: SparkPlan): Boolean = strip(child) match {
    case h: HashAggregateExec => h.groupingExpressions.isEmpty
    case s: SortAggregateExec => s.groupingExpressions.isEmpty
    case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
    case _ => false
  }

  private[graft] def violations(name: String, plan: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    walk(plan).foreach {
      case _: CartesianProductExec => out += "CartesianProduct"
      case j: BroadcastNestedLoopJoinExec =>
        val build = strip(j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        })
        val benign =
          (j.joinType == Cross && j.condition.isEmpty) ||
            build.isInstanceOf[LocalTableScanExec] ||
            build.isInstanceOf[ReusedExchangeExec]
        val excused = Allowed.get(name).exists { case (frag, _) =>
          j.condition.map(_.toString).exists(_.contains(frag))
        }
        if (!benign && !excused)
          out += s"BNLJ type=${j.joinType} cond=${j.condition.map(_.toString.take(120)).getOrElse("None")}"
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        val excused = AllowedFunnel.get(name).exists { case (frag, _) =>
          strip(e.child) match {
            case h: HashAggregateExec =>
              h.groupingExpressions.map(_.toString).exists(_.contains(frag))
            case s: SortAggregateExec =>
              s.groupingExpressions.map(_.toString).exists(_.contains(frag))
            case _ => false
          }
        }
        if (!isScalarMerge(e.child) && !excused)
          out += s"SinglePartition over ${strip(e.child).nodeName}"
      case _ => ()
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val v = violations(name, fn(spark, sfDir).queryExecution.executedPlan)
          .distinct
        if (v.nonEmpty) {
          bad += 1
          println(s"""{"query":"$name","violations":${v.map(s =>
            "\"" + s.replace("\"", "'") + "\"").mkString("[", ",", "]")}}""")
        }
      } catch { case e: Throwable =>
        bad += 1
        println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}: ${e.getMessage.take(120).replace("\"", "'")}"}""")
      }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"plan_gate":"${if (bad == 0) "PASS" else "FAIL"}","queries":${SparkEntry.queries.size},"violating":$bad,"allowlisted":${Allowed.size + AllowedFunnel.size},"sec":$sec%.1f}""")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
