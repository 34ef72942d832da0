package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× expansion of a testdata SF dir — the locally
  * generated sf1 slice that extends the scale-slope evidence from a
  * 10× measured span to 100× (round-11 verdict #2; the driver's own
  * generator is not in the sandbox, so the slice derives from sf0.1
  * by a documented, distribution-preserving expansion).
  *
  * Scheme: each table is the union of `copies` deterministic copies
  * (copy 0 = the original, byte-identical values).
  *
  *  - Every id-domain key (custkey, orderkey, partkey, suppkey,
  *    user_id, event_id, doc_id, vec_id) is offset by copy·M with
  *    M = lcm of every `id % m` constant the query inventory uses
  *    (2,3,4,5,7,10,11,25,50,97,100,101,103,500,1000 → M =
  *    233 100 021 000). Offsets ≡ 0 (mod every m), so every
  *    mod-derived predicate/sample keeps its exact per-copy
  *    selectivity, and referential integrity holds within a copy
  *    (all keys in one copy shift together; copies never cross-join).
  *  - region/nation are fixed dimensions (constant at every SF, as in
  *    TPC-H) and copy through unchanged.
  *  - Timestamps, amounts, and categorical values are unchanged:
  *    domains grow 10×, densities per time window grow 10× — the
  *    TPC-H scaling model (more customers, not longer histories).
  *  - documents.text for copy k>0 goes through a per-copy
  *    length-preserving VOCABULARY BIJECTION (stopwords fixed) — a
  *    token-level isomorphism, so every intra-copy structure (word
  *    order, exact-dup groups, shingle Jaccard, prefix-block sizes,
  *    n_chars, language/stopword signals) replicates EXACTLY per
  *    copy while cross-copy token overlap collapses to hash
  *    collisions — dedup yield and blocking-bucket work scale with
  *    the data instead of exploding quadratically across copies
  *    (see substituteDocs for the measured failure of weaker
  *    schemes).
  *  - embeddings for copy k>0 are coordinate-permuted by a seeded
  *    per-copy permutation: within-copy cosines equal the base
  *    cosines up to float summation order (the permutation reorders
  *    the dot-product sum, so a pair sitting within an ulp of an r4
  *    snap boundary can flip — identical after the snap everywhere
  *    else, and cross-ENGINE parity is unaffected since both engines
  *    see the same permuted data), and cross-copy
  *    cosines follow the corpus' natural random-pair distribution —
  *    measured at sf0.1: qualifying rate at τ=0.35 is 0.00208
  *    cross-permuted vs 0.00207 natural, so threshold-pair queries
  *    scale by their true quadratic semantics, not by an artifact.
  *
  * Run: `runMain graft.GenData /root/testdata/sf0.1 localdata/sf1 10`
  */
object GenData {

  /** lcm{2,3,4,5,7,10,11,25,50,97,100,101,103,500,1000} — every key
    * offset is ≡ 0 mod each of these (see scheme note above). */
  val KeyOffsetUnit: Long = 233100021000L

  private val IdCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Copy-k documents by per-copy VOCABULARY SUBSTITUTION: every
    * non-stopword word maps through a length-preserving bijection of
    * the corpus vocabulary (rank-align each length class by
    * xxhash64(word) against xxhash64(word ⊕ k)); stopwords (the
    * langMarkers lists) map to themselves.
    *
    * This is a token-level isomorphism of the corpus, so EVERY
    * intra-copy structure replicates exactly: word order, token
    * counts, n_chars (length-preserving), exact-dup groups (mapping is
    * content-only), shingle-set Jaccard (bijections preserve set
    * overlap), prefix-block sizes (q35's 12-char buckets), language
    * and stopword signals (markers fixed). Cross-copy overlap
    * collapses to hash collisions. Earlier schemes (hash-sorted word
    * order, ± rotation) correlated PREFIXES across a copy's docs and
    * blew q35's blocking buckets up 373× — measured via Σ bucket² —
    * where the substitution holds them at exactly 10×. */
  private def substituteDocs(base: DataFrame, k: Int): DataFrame = {
    val stop = graft.functions.TextFunctions.langMarkers.flatMap(_._2)
    val words = base
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(!col("w").isInCollection(stop) && col("w") =!= "")
      .distinct()
    val byBase = org.apache.spark.sql.expressions.Window
      .partitionBy(length(col("w"))).orderBy(xxhash64(col("w")), col("w"))
    val byCopy = org.apache.spark.sql.expressions.Window
      .partitionBy(length(col("w")))
      .orderBy(xxhash64(concat(col("w"), lit(s"§$k"))), col("w"))
    val src = words.select(col("w"), length(col("w")).as("l"),
      row_number().over(byBase).as("r"))
    val dst = words.select(col("w").as("w2"), length(col("w")).as("l"),
      row_number().over(byCopy).as("r"))
    val mapping = src.join(dst, Seq("l", "r")).select(col("w"), col("w2"))
    val toks = base.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("p", "w")))
    val rebuilt = toks.join(mapping, Seq("w"), "left")
      .select(col("doc_id"), col("p"), coalesce(col("w2"), col("w")).as("w"))
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("w")))),
          s => s.getField("w"))).as("text"))
    base.drop("text").join(rebuilt, "doc_id")
      .select(base.columns.toIndexedSeq.map(col): _*)
  }

  /** Seeded coordinate permutation for copy k (identity for k = 0). */
  private def coordPerm(dim: Int, k: Int): Seq[Int] = {
    val rnd = new scala.util.Random(1000 + k)
    rnd.shuffle((0 until dim).toVector)
  }

  private def permuteEmbedding(emb: Column, dim: Int, k: Int): Column =
    transform(typedLit(coordPerm(dim, k)), i => element_at(emb, i + 1))

  private[graft] def expand(spark: SparkSession, srcDir: String,
      name: String, copies: Int): DataFrame = {
    val base = Tables.load(spark, srcDir, name)
    if (name == "region" || name == "nation") base
    else {
      val ids = IdCols(name)
      // Per-copy offset = the input's real key span rounded UP to a
      // multiple of KeyOffsetUnit. For fresh testdata (max id < M)
      // this is exactly M — byte-identical to the fixed-unit scheme —
      // but it stays collision-free for ANY input: expanding an
      // ALREADY-expanded dir with the fixed unit reused the same
      // offsets and silently collided keys (measured r15: sf1 × 10
      // produced 500k document rows with only 95k distinct doc_ids,
      // which broke every dedup/pair operator downstream). Offsets
      // stay ≡ 0 (mod every m), so mod-derived selectivities are
      // still exact per copy.
      val maxId = ids.map(c =>
        base.agg(max(col(c).cast("long"))).head().getLong(0)).max
      val unit = (maxId / KeyOffsetUnit + 1) * KeyOffsetUnit
      val dim = if (name == "embeddings")
        base.select(size(col("embedding"))).head().getInt(0)
      else 0
      (0 until copies).map { k =>
        val off = k.toLong * unit
        val perturbed = name match {
          case "documents" if k > 0 => substituteDocs(base, k)
          case "embeddings" if k > 0 =>
            base.withColumn("embedding",
              permuteEmbedding(col("embedding"), dim, k))
          case _ => base
        }
        ids.foldLeft(perturbed)((df, c) =>
          df.withColumn(c, col(c) + lit(off)))
      }.reduce(_ unionByName _)
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dstDir = args.lift(1).getOrElse("localdata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { name =>
      val df = expand(spark, srcDir, name, copies)
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      // Loud key-collision gate: disjoint copy offsets multiply every
      // id column's distinct count by exactly `copies` (holds for
      // non-unique fks too). A silent collision here corrupts every
      // downstream dedup/join result (the r15 double-expansion bug).
      if (name != "region" && name != "nation") {
        val out = spark.read.parquet(s"$dstDir/$name.parquet")
        IdCols(name).foreach { c =>
          val baseD = Tables.load(spark, srcDir, name)
            .select(col(c)).distinct().count()
          val expD = out.select(col(c)).distinct().count()
          require(expD == baseD * copies,
            s"$name.$c key collision: expected ${baseD * copies} " +
              s"distinct ids after ${copies}x expansion, got $expD")
        }
      }
      println(s"[gendata] $name -> $dstDir/$name.parquet")
    }
    spark.stop()
  }
}
