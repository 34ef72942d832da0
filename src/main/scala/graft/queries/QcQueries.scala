package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Num

/** Data-quality tier: expectation checks and distribution-drift
  * detection — the QC gates a production ingestion pipeline runs
  * before letting a new batch into the training corpus.
  *
  * Scale notes (100 TB): q101 folds every row-level rule into ONE
  * corpus scan (conditional sums with map-side partials; the single
  * distinct aggregate rides the same scan); q102 is two grouped
  * aggregations over (snapshot, bucket) — bucket cardinality is tiny
  * and fixed, so everything after the first map-side reduction is
  * free. Neither query ever shuffles row-level data.
  */
object QcQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // ---- q101: expectation checks — declarative row-level rules
  // (not-null, range, set membership, cross-column consistency,
  // pattern) plus a table-level uniqueness check, all evaluated in a
  // single aggregation; one row per rule with its violation count. ----

  /** Row-level rules as (name, violation-predicate). A row violates
    * the rule when the predicate is TRUE (null-safe: a null that makes
    * a check unverifiable counts as a violation). */
  private def rules: Seq[(String, Column)] = Seq(
    "text_not_null" -> col("text").isNull,
    "lang_in_set" ->
      (!col("lang").isin("en", "de", "es", "fr", "zh") || col("lang").isNull),
    "n_chars_positive" -> (col("n_chars").isNull || col("n_chars") <= 0),
    "n_chars_consistent" ->
      (col("text").isNull || col("n_chars").isNull ||
        col("n_chars") =!= length(col("text"))),
    "source_pattern" ->
      (col("source").isNull || !col("source").rlike("^src[0-9]+$")))

  def q101Expectations(spark: SparkSession, dir: String): DataFrame =
    expectationReport(docs(spark, dir))

  private[graft] def expectationReport(d: DataFrame): DataFrame = {
    val aggs =
      rules.map { case (n, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(n)
      } ++ Seq(
        count(lit(1)).as("_total"),
        countDistinct(col("doc_id")).as("_distinct"))
    val wide = d.agg(aggs.head, aggs.tail: _*)
    val ruleRows = rules.map { case (n, _) =>
      s"'$n', `$n`"
    } :+ "'doc_id_unique', _total - _distinct"
    val stacked = wide.select(col("_total"),
      expr(s"stack(${ruleRows.size}, ${ruleRows.mkString(", ")}) AS (rule, violations)"))
    stacked.select(col("rule"), col("violations").cast("long").as("violations"),
        col("_total").as("checked"))
      .orderBy(col("rule"))
  }

  val q101Sql: String = {
    val sqlBad = Seq(
      "text_not_null" -> "text IS NULL",
      "lang_in_set" ->
        "lang IS NULL OR lang NOT IN ('en', 'de', 'es', 'fr', 'zh')",
      "n_chars_positive" -> "n_chars IS NULL OR n_chars <= 0",
      "n_chars_consistent" ->
        "text IS NULL OR n_chars IS NULL OR n_chars <> length(text)",
      "source_pattern" ->
        "source IS NULL OR NOT regexp_matches(source, '^src[0-9]+$')")
    val ruleSelects = sqlBad.map { case (n, bad) =>
      s"SELECT '$n' AS rule, CAST(sum(CASE WHEN $bad THEN 1 ELSE 0 END) AS BIGINT) AS violations, count(*) AS checked FROM documents"
    } :+
      "SELECT 'doc_id_unique', CAST(count(*) - count(DISTINCT doc_id) AS BIGINT), count(*) FROM documents"
    s"""SELECT rule, violations, checked
       |FROM (${ruleSelects.mkString("\n      UNION ALL ")})
       |ORDER BY rule""".stripMargin
  }

  // ---- q102: distribution drift between two corpus snapshots
  // (population stability index, the standard drift gate): per
  // feature bucket, the reference and current shares and the PSI
  // contribution (p_cur − p_ref)·ln(p_cur/p_ref), ε-clamped so empty
  // buckets don't produce infinities. Snapshots here are the
  // deterministic doc_id-parity halves (the "yesterday vs today"
  // shape without needing two physical tables). ----

  private val PsiEps = 1e-6
  private val LenBin = 500L

  def q102Drift(spark: SparkSession, dir: String): DataFrame =
    driftReport(docs(spark, dir)
      .withColumn("snap", when(col("doc_id") % 2 === 0, "ref").otherwise("cur")))

  /** PSI per (feature, bucket) between the `snap = 'ref'` and
    * `snap = 'cur'` halves of `d`. */
  private[graft] def driftReport(d: DataFrame): DataFrame = {
    def featureTable(feature: String, bucket: Column): DataFrame = {
      // NULL feature values become an explicit bucket: Spark sorts
      // NULLs first ascending, DuckDB last — a sentinel keeps the
      // ordered output identical (and makes the null share visible,
      // which a drift report wants anyway)
      val counts = d.groupBy(col("snap"),
          coalesce(bucket, lit("(null)")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy(col("snap")).agg(sum(col("n")).as("tot"))
      counts.join(tot, "snap")
        .withColumn("p", col("n") / col("tot"))
        .groupBy(col("bucket"))
        .agg(
          sum(when(col("snap") === "ref", col("p")).otherwise(0.0)).as("p_ref"),
          sum(when(col("snap") === "cur", col("p")).otherwise(0.0)).as("p_cur"))
        .select(lit(feature).as("feature"), col("bucket"),
          Num.r4(col("p_ref")).as("p_ref"), Num.r4(col("p_cur")).as("p_cur"),
          Num.r4((greatest(col("p_cur"), lit(PsiEps)) -
              greatest(col("p_ref"), lit(PsiEps))) *
            log(greatest(col("p_cur"), lit(PsiEps)) /
              greatest(col("p_ref"), lit(PsiEps)))).as("psi"))
    }
    featureTable("lang", col("lang"))
      .unionByName(featureTable("len_bin",
        concat(lit("b"), floor(col("n_chars") / LenBin).cast("string"))))
      .orderBy(col("feature"), col("bucket"))
  }

  val q102Sql: String = {
    def clamp(e: String) = s"greatest($e, $PsiEps)"
    def feature(name: String, bucket: String) =
      s"""SELECT '$name' AS feature, bucket,
         |  ${Num.sqlR4("p_ref")} AS p_ref, ${Num.sqlR4("p_cur")} AS p_cur,
         |  ${Num.sqlR4(s"(${clamp("p_cur")} - ${clamp("p_ref")}) * ln(${clamp("p_cur")} / ${clamp("p_ref")})")} AS psi
         |FROM (
         |  SELECT bucket,
         |    sum(CASE WHEN snap = 'ref' THEN p ELSE 0.0 END) AS p_ref,
         |    sum(CASE WHEN snap = 'cur' THEN p ELSE 0.0 END) AS p_cur
         |  FROM (
         |    SELECT snap, bucket,
         |      count(*) / (sum(count(*)) OVER (PARTITION BY snap))::DOUBLE AS p
         |    FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS snap,
         |            coalesce($bucket, '(null)') AS bucket FROM documents)
         |    GROUP BY snap, bucket)
         |  GROUP BY bucket)""".stripMargin
    s"""SELECT feature, bucket, p_ref, p_cur, psi FROM (
       |${feature("lang", "lang")}
       |UNION ALL
       |${feature("len_bin", s"'b' || CAST(n_chars // $LenBin AS VARCHAR)")})
       |ORDER BY feature, bucket""".stripMargin
  }

  // ---- q164: referential-integrity audit — the dbt-test / FK-check
  // tier over the star schema: one row per declared relationship with
  // child row count, orphan count (children whose key matches no
  // parent), and distinct orphan keys. Each relationship is a
  // LEFT ANTI join with the PARENT side broadcast (dimension keys are
  // always the small side — customer/part keys at 100 TB are still
  // dimension-sized relative to the fact tables), followed by one
  // partial-aggregated count; the fact table is never reshuffled. ----

  def q164Integrity(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val keys = parent.select(col(parentKey).as(childKey)).distinct()
      // null FKs are excluded from the orphan count on both sides
      // (SQL NOT IN would silently drop them anyway — null-key rows
      // are a q101-style not-null expectation, not an FK violation)
      val orphans = child.select(col(childKey))
        .filter(col(childKey).isNotNull)
        .join(broadcast(keys), Seq(childKey), "left_anti")
      child.agg(count(lit(1)).as("child_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("orphan_rows"),
          countDistinct(col(childKey)).as("orphan_keys")))
        .select(lit(name).as("relationship"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val p = Tables.load(spark, dir, "part")
    val s = Tables.load(spark, dir, "supplier")
    rel("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(rel("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"))
      .unionByName(rel("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionByName(rel("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(rel("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .orderBy(col("relationship"))
  }

  val q164Sql: String = {
    def rel(name: String, child: String, childKey: String,
        parent: String, parentKey: String): String =
      s"""SELECT '$name' AS relationship,
         |  (SELECT count(*) FROM $child) AS child_rows,
         |  count(*) AS orphan_rows,
         |  count(DISTINCT $childKey) AS orphan_keys
         |FROM $child
         |WHERE $childKey IS NOT NULL
         |  AND $childKey NOT IN (SELECT $parentKey FROM $parent
         |                        WHERE $parentKey IS NOT NULL)""".stripMargin
    Seq(
      rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      rel("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      rel("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      rel("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY relationship")
  }

  // ---- q166: delete-one-bucket jackknife standard error of the mean
  // purchase value — uncertainty quantification for a pipeline metric
  // without a second data pass: B deterministic hash buckets, one
  // grouped (sum, count) scan, then B leave-one-out means computed
  // from the 20-row bucket frame. This is how a 100 TB pipeline puts
  // an error bar on a mean: the only per-row work is the bucket
  // assignment; everything statistical happens on B rows. Per-bucket
  // sums are r6-snapped so partial-aggregation order can't leak into
  // the leave-one-out arithmetic. ----

  private val JkB = 20

  def q166Jackknife(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val buckets = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select((TF.hash60(col("event_id").cast("string")) % JkB).as("b"),
        col("value"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_i"), Num.r(sum(col("value")), 6).as("s_i"))
    val tot = buckets.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s"),
      count(lit(1)).as("nb"))
    val loo = buckets.crossJoin(broadcast(tot))
      .select(((col("s") - col("s_i")) / (col("n") - col("n_i"))).as("m_i"),
        col("n"), col("s"), col("nb"))
    val mbar = loo.agg(Num.r(avg(col("m_i")), 6).as("mbar"))
    loo.crossJoin(broadcast(mbar))
      .agg(
        max(col("n")).as("n_purchases"),
        Num.r4(max(col("s") / col("n"))).as("mean_value"),
        Num.r(sqrt(
          ((max(col("nb")) - 1).cast("double") / max(col("nb"))) *
            Num.r(sum(pow(col("m_i") - col("mbar"), 2)), 6)), 6)
          .as("jackknife_se"))
  }

  val q166Sql: String = {
    import graft.functions.{TextFunctions => TF}
    s"""WITH b AS (
       |  SELECT ${TF.sqlHash60("event_id::VARCHAR")} % $JkB AS b,
       |    count(*) AS n_i, ${Num.sqlR("sum(value)", 6)} AS s_i
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |tot AS (SELECT sum(n_i) AS n, sum(s_i) AS s, count(*) AS nb FROM b),
       |loo AS (SELECT (t.s - b.s_i) / (t.n - b.n_i) AS m_i, t.n, t.s, t.nb
       |        FROM b CROSS JOIN tot t),
       |mb AS (SELECT ${Num.sqlR("avg(m_i)", 6)} AS mbar FROM loo)
       |SELECT CAST(max(n) AS BIGINT) AS n_purchases,
       |  ${Num.sqlR4("max(s / n)")} AS mean_value,
       |  ${Num.sqlR(
          s"sqrt(((max(nb) - 1)::DOUBLE / max(nb)) * ${Num
            .sqlR("sum(pow(m_i - mbar, 2))", 6)})",
          6)} AS jackknife_se
       |FROM loo CROSS JOIN mb""".stripMargin
  }

  // ---- q182: split-balance audit — is the train/val/test assignment
  // independent of language? A hash split SHOULD be (it keys on
  // doc_id only), but a leaky split (keyed on anything correlated
  // with content) shows up here first, and downstream eval is biased
  // before any model is trained. Full lang × split contingency table
  // with per-cell χ² contributions against the independence
  // expectation E = row·col/n — exact integer margins, doubles only
  // in the final term. ----

  def q182SplitBalance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TFn}
    val cells = docs(spark, dir)
      .select(col("lang"), TFn.splitAssign(col("doc_id")).as("split"))
      .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col("lang")).agg(sum(col("n")).as("row_n"))
    val colT = cells.groupBy(col("split")).agg(sum(col("n")).as("col_n"))
    val tot = broadcast(cells.agg(sum(col("n")).as("total")))
    cells.join(broadcast(rowT), "lang")
      .join(broadcast(colT), "split")
      .crossJoin(tot)
      .withColumn("expected", Num.r(
        col("row_n").cast("double") * col("col_n") / col("total"), 4))
      .select(col("lang"), col("split"), col("n"), col("expected"),
        Num.r(pow(col("n") - col("expected"), 2) / col("expected"), 6)
          .as("chi2_term"))
      .orderBy(col("lang"), col("split"))
  }

  val q182Sql: String = {
    import graft.functions.{TextFunctions => TFn}
    s"""WITH d AS (
       |  SELECT lang, ${TFn.sqlSplitCase(
          TFn.sqlHash60("doc_id::VARCHAR") + " % 100")} AS split
       |  FROM documents),
       |cells AS (SELECT lang, split, count(*) AS n FROM d GROUP BY 1, 2),
       |rt AS (SELECT lang, sum(n) AS row_n FROM cells GROUP BY 1),
       |ct AS (SELECT split, sum(n) AS col_n FROM cells GROUP BY 1),
       |t AS (SELECT sum(n) AS total FROM cells)
       |SELECT c.lang, c.split, c.n,
       |  ${Num.sqlR("rt.row_n::DOUBLE * ct.col_n / t.total", 4)} AS expected,
       |  ${Num.sqlR(
          s"pow(c.n - ${Num.sqlR("rt.row_n::DOUBLE * ct.col_n / t.total", 4)}, 2)" +
            s" / ${Num.sqlR("rt.row_n::DOUBLE * ct.col_n / t.total", 4)}", 6)}
       |    AS chi2_term
       |FROM cells c
       |JOIN rt ON c.lang = rt.lang
       |JOIN ct ON c.split = ct.split
       |CROSS JOIN t
       |ORDER BY c.lang, c.split""".stripMargin
  }

  // ---- q185: Poisson-bootstrap standard error of the mean purchase
  // value — the RESAMPLING error bar beside q166's jackknife. A true
  // multinomial bootstrap needs global coordination (each resample
  // draws exactly n rows); the Poisson(1) bootstrap replaces the
  // multinomial with independent per-row Poisson(1) replica weights —
  // the standard approximation for map-reduce resampling, because
  // each row computes its B weights locally from a hash and the only
  // shuffle is B replica partial sums. Weights come from the inverse
  // Poisson(1) CDF over the deterministic hash-uniform, so both
  // engines draw the IDENTICAL resamples; value rides as integer
  // cents so all per-replica sums are exact 64-bit and partial-agg
  // order cannot drift. Everything statistical happens on the B-row
  // replica frame (the q166 contract). ----

  private val BootB = 20
  /** Cumulative Poisson(1) probabilities P(X <= k), k = 0..7, as
    * shortest-repr double literals (identical parse both engines;
    * emitted with ::DOUBLE in SQL — a bare decimal literal is DECIMAL
    * in DuckDB). u >= cdf(7) (p ~ 1e-5) caps the weight at 8. */
  private val PoisCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  def q185Bootstrap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val base = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").cast("string").as("id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val rep = base
      .select(col("id"), col("cents"),
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .withColumn("u",
        (TF.hash32(concat(col("id"), lit("#bs"), col("b").cast("string")))
          + 1).cast("double") / 4294967296.0d)
      .withColumn("w",
        PoisCdf.zipWithIndex.tail
          .foldLeft(when(col("u") < lit(PoisCdf.head), 0L)) {
            case (acc, (c, k)) => acc.when(col("u") < lit(c), k.toLong)
          }.otherwise(8L))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("cents")).as("ws"), sum(col("w")).as("wn"))
      .select(((col("ws").cast("double") / col("wn")) / 100.0).as("m_b"))
    val tot = base.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val mbar = rep.agg(Num.r(avg(col("m_b")), 6).as("mbar"))
    rep.crossJoin(broadcast(mbar)).crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n_purchases"),
        Num.r4((max(col("s")).cast("double") / max(col("n"))) / 100.0)
          .as("mean_value"),
        Num.r(sqrt(
          Num.r(sum(pow(col("m_b") - col("mbar"), 2)), 6) / (BootB - 1)), 6)
          .as("boot_se"))
  }

  val q185Sql: String = {
    import graft.functions.{TextFunctions => TF}
    val caseW = PoisCdf.zipWithIndex.map { case (c, k) =>
      s"WHEN u < $c::DOUBLE THEN $k"
    }.mkString("CASE ", " ", " ELSE 8 END")
    s"""WITH base AS (
       |  SELECT event_id::VARCHAR AS id,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |e AS (
       |  SELECT b, cents, $caseW AS w
       |  FROM (SELECT id, cents, b,
       |          (${TF.sqlHash32("id || '#bs' || b::VARCHAR")} + 1)::DOUBLE
       |            / 4294967296.0 AS u
       |        FROM base CROSS JOIN
       |          (SELECT unnest(range(0, $BootB)) AS b))),
       |rep AS (
       |  SELECT ((sum(w * cents)::DOUBLE / sum(w)) / 100.0) AS m_b
       |  FROM e GROUP BY b),
       |tot AS (SELECT count(*) AS n, sum(cents) AS s FROM base),
       |mb AS (SELECT ${Num.sqlR("avg(m_b)", 6)} AS mbar FROM rep)
       |SELECT CAST(max(n) AS BIGINT) AS n_purchases,
       |  ${Num.sqlR4("(max(s)::DOUBLE / max(n)) / 100.0")} AS mean_value,
       |  ${Num.sqlR(
          s"sqrt(${Num.sqlR("sum(pow(m_b - mbar, 2))", 6)} / (${BootB} - 1))",
          6)} AS boot_se
       |FROM rep CROSS JOIN mb CROSS JOIN tot""".stripMargin
  }

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_expectations" -> (q101Expectations _),
    "q102_drift" -> (q102Drift _),
    "q164_integrity" -> (q164Integrity _),
    "q166_jackknife" -> (q166Jackknife _),
    "q182_split_balance" -> (q182SplitBalance _),
    "q185_bootstrap_se" -> (q185Bootstrap _))

  def oracles: Map[String, String] = Map(
    "q101_expectations" -> q101Sql,
    "q102_drift" -> q102Sql,
    "q164_integrity" -> q164Sql,
    "q166_jackknife" -> q166Sql,
    "q182_split_balance" -> q182Sql,
    "q185_bootstrap_se" -> q185Sql)
}
