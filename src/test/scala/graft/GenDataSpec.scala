package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Spec-pins GenData's expansion scheme (r15 collision incident +
  * r15 advice), so a future edit cannot silently reintroduce either
  * corruption class:
  *
  *  1. fresh-testdata expansion is BYTE-IDENTICAL to the historical
  *     fixed-unit scheme (globalUnit == KeyOffsetUnit whenever every
  *     max id < KeyOffsetUnit) and drift-pinned by golden fingerprints
  *     over a synthetic fixture;
  *  2. re-expanding an ALREADY-expanded dir keeps every id column's
  *     distinct count multiplying by `copies` (the r15 bug: the fixed
  *     unit reused offsets — 500k doc rows / 95k distinct doc_ids);
  *  3. the offset unit is GLOBAL across tables — per-table units
  *     silently dangle copy-k foreign keys when key spans differ
  *     (r15 advice), and the gate's FK-coverage check catches exactly
  *     that scheme;
  *  4. an empty input table fails loudly instead of NPE-ing.
  */
class GenDataSpec extends SparkSpec {

  private val tmp: Path = Files.createTempDirectory("gendata-spec")
  override def afterAll(): Unit = { TempDirs.deleteRecursively(tmp); super.afterAll() }

  private def dir(name: String): String = tmp.resolve(name).toString

  /** Minimal synthetic SF dir: every IdCols table with deterministic
    * tiny contents (schemas limited to the columns GenData touches;
    * events needs a ts column because Tables.load inspects it). */
  private def writeSyntheticBase(d: String): Unit = {
    val s = spark
    import s.implicits._
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/$name.parquet")
    w((1L to 10L).toDF("c_custkey"), "customer")
    w((1L to 3L).toDF("s_suppkey"), "supplier")
    w((1L to 5L).toDF("p_partkey"), "part")
    w((1L to 30L).map(k => (k, k % 10 + 1)).toDF("o_orderkey", "o_custkey"), "orders")
    w((1L to 60L).map(k => (k % 30 + 1, k % 5 + 1, k % 3 + 1))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    w((1L to 20L).map(k => (k, k % 10 + 1, k * 1000000L))
      .toDF("event_id", "user_id", "ts"), "events")
    w(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "how vexingly quick daft zebras jump"),
      (6L, "the five boxing wizards jump quickly")).toDF("doc_id", "text"),
      "documents")
    w((1L to 4L).map(k =>
        (k, Array.tabulate(8)(i => (k * 8 + i).toFloat / 10f)))
      .toDF("vec_id", "embedding"), "embeddings")
  }

  private def expandAll(src: String, dst: String, copies: Int, unit: Long): Unit =
    GenData.IdTables.foreach { name =>
      GenData.expand(spark, src, name, copies, unit)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
    }

  test("fresh-testdata unit is exactly KeyOffsetUnit (byte-identical guarantee)") {
    writeSyntheticBase(dir("base"))
    assert(GenData.globalUnit(spark, dir("base")) === GenData.KeyOffsetUnit)
    assert(GenData.globalUnit(spark, "/root/testdata/sf0.001") === GenData.KeyOffsetUnit)
  }

  test("golden fingerprints: offset arithmetic, vocab substitution, coord permutation") {
    writeSyntheticBase(dir("base"))
    val fps = Seq("orders", "documents", "embeddings").map { name =>
      name -> CrossPlan.fingerprint(
        GenData.expand(spark, dir("base"), name, 3, GenData.KeyOffsetUnit))
    }.toMap
    // orders/embeddings pinned from the first run of this spec on the
    // fixed generator (commit 37c57c7 lineage); documents re-pinned
    // r17 when the vocabulary bijection became a per-copy character
    // bijection (saturation fix — see substituteDocs). A mismatch
    // means the expansion scheme changed — every committed
    // slope/crossplan/sweep record above sf0.1 was produced by the
    // scheme of its recorded HEAD and would need regeneration.
    val golden = Map(
      "orders" -> CrossPlan.Fp(90L, "-9589752660030826170", -2554187678008321574L),
      "documents" -> CrossPlan.Fp(18L, "2524771878255778153", -4313488900547963579L),
      "embeddings" -> CrossPlan.Fp(12L, "-5696127520057274202", -5440374932380078636L))
    assert(fps === golden, s"expansion fingerprints drifted: $fps")
  }

  test("char substitution is a token isomorphism with per-copy disjoint vocabularies") {
    writeSyntheticBase(dir("base"))
    val s = spark
    import s.implicits._
    val x3 = GenData.expand(spark, dir("base"), "documents", 3,
      GenData.KeyOffsetUnit)
    val stop = graft.functions.TextFunctions.langMarkers.flatMap(_._2).toSet
    val docs = x3.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    val base = (1L to 6L).map(docs)
    def copyOf(k: Int) =
      (1L to 6L).map(i => docs(i + k * GenData.KeyOffsetUnit))
    (1 to 2).foreach { k =>
      val c = copyOf(k)
      base.zip(c).foreach { case (b, t) =>
        val (bw, tw) = (b.split(" "), t.split(" "))
        // word-aligned, length-preserving, stopwords fixed
        assert(bw.length == tw.length)
        bw.zip(tw).foreach { case (wb, wt) =>
          assert(wb.length == wt.length, s"length drift $wb -> $wt")
          if (stop(wb)) assert(wt == wb, s"stopword $wb rewritten")
        }
      }
      // exact-dup structure replicates: docs 1 and 2 are identical in
      // the base, so their copies must be identical too (and distinct
      // from doc 3's copy)
      assert(c(0) == c(1) && c(0) != c(2))
    }
    // per-copy vocabularies are DISJOINT (the r17 saturation fix):
    // non-stopword words of base, copy 1, and copy 2 share nothing —
    // so the shingle space grows with the data instead of saturating
    def vocab(texts: Seq[String]) =
      texts.flatMap(_.split(" ")).filterNot(stop).filter(_.nonEmpty).toSet
    val vs = Seq(vocab(base), vocab(copyOf(1)), vocab(copyOf(2)))
    for (i <- vs.indices; j <- vs.indices if i < j)
      assert(vs(i).intersect(vs(j)).isEmpty,
        s"copy $i and $j share vocabulary: ${vs(i).intersect(vs(j))}")
  }

  test("re-expanding an expanded dir keeps distinct-id multiplication and FKs (r15 bug class)") {
    writeSyntheticBase(dir("base"))
    val u1 = GenData.globalUnit(spark, dir("base"))
    expandAll(dir("base"), dir("x2"), 2, u1)
    GenData.gate(spark, dir("base"), dir("x2"), 2)
    // second expansion: max id is now base+unit, so the derived unit
    // must grow to 2×M — the fixed unit would collide copy 1 of the
    // re-expansion onto copy 1 of the first expansion.
    val u2 = GenData.globalUnit(spark, dir("x2"))
    assert(u2 === 2L * GenData.KeyOffsetUnit)
    expandAll(dir("x2"), dir("x4"), 2, u2)
    val evidence = GenData.gate(spark, dir("x2"), dir("x4"), 2)
    assert(evidence.contains("\"ok\":true"))
  }

  test("gate catches per-table offset units (cross-table FK divergence, r15 advice)") {
    writeSyntheticBase(dir("base"))
    // Simulate the rejected per-table scheme: orders shifts by 2M
    // while customer (and everything else) shifts by M. Every
    // per-column distinct count still multiplies by `copies`, so only
    // the FK-coverage check can see the corruption.
    GenData.IdTables.foreach { name =>
      val unit = if (name == "orders") 2L * GenData.KeyOffsetUnit
                 else GenData.KeyOffsetUnit
      GenData.expand(spark, dir("base"), name, 2, unit)
        .write.mode(SaveMode.Overwrite).parquet(s"${dir("bad")}/$name.parquet")
    }
    val e = intercept[IllegalArgumentException] {
      GenData.gate(spark, dir("base"), dir("bad"), 2)
    }
    assert(e.getMessage.contains("FK"), e.getMessage)
  }

  test("empty input table fails loudly (no NPE)") {
    val s = spark
    import s.implicits._
    Seq.empty[Long].toDF("c_custkey").write
      .mode(SaveMode.Overwrite).parquet(s"${dir("empty")}/customer.parquet")
    val e = intercept[IllegalArgumentException] {
      GenData.globalUnit(spark, dir("empty"))
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }
}
