package graft.operators

import graft.SparkSpec
import graft.queries.QcQueries
import org.apache.spark.sql.functions._

/** QC tier: expectation checks catch exactly the injected violations;
  * drift PSI matches the hand formula and is ~0 for identical halves. */
class QcSpec extends SparkSpec {
  import spark.implicits._

  test("expectations: each injected violation counted once, clean rows pass") {
    val d = Seq(
      // (doc_id, text, lang, source, n_chars)
      (1L, "good doc", "en", "src1", 8L), // clean
      (2L, null.asInstanceOf[String], "en", "src2", 0L), // null text (+consistency unverifiable, +n_chars<=0)
      (3L, "bad lang", "xx", "src3", 8L), // lang violation
      (4L, "short", "de", "src4", 99L), // n_chars mismatch
      (5L, "bad source", "fr", "SRC5", 10L), // source pattern
      (5L, "dup id", "es", "src6", 6L) // duplicate doc_id
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = QcQueries.expectationReport(d)
      .as[(String, Long, Long)].collect().toSeq
    val m = got.map(r => r._1 -> r._2).toMap
    assert(m == Map(
      "text_not_null" -> 1L,
      "lang_in_set" -> 1L,
      "n_chars_positive" -> 1L,
      "n_chars_consistent" -> 2L, // null text is unverifiable → violation
      "source_pattern" -> 1L,
      "doc_id_unique" -> 1L))
    assert(got.head._3 == 6L) // checked = table size for every rule
  }

  test("drift: zero for identical halves, hand-computed PSI for a shifted bucket") {
    // ref: 8×en 2×de; cur: 5×en 5×de — lang drift, identical lengths
    val rows =
      (0 until 8).map(i => (s"ref$i", "en", 100L)) ++
        (0 until 2).map(i => (s"refd$i", "de", 100L)) ++
        (0 until 5).map(i => (s"cur$i", "en", 100L)) ++
        (0 until 5).map(i => (s"curd$i", "de", 100L))
    val d = rows.toDF("id", "lang", "n_chars")
      .withColumn("snap",
        when(col("id").startsWith("ref"), "ref").otherwise("cur"))
    val got = QcQueries.driftReport(d)
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    def psi(pr: Double, pc: Double): Double =
      Num.j((pc - pr) * math.log(pc / pr), 4)
    assert(got(("lang", "en"))._5 == psi(0.8, 0.5))
    assert(got(("lang", "de"))._5 == psi(0.2, 0.5))
    // same length everywhere → len_bin PSI exactly 0
    assert(got(("len_bin", "b0"))._5 == 0.0)
  }

  test("drift: a bucket absent from one snapshot is eps-clamped, not infinite") {
    val rows =
      (0 until 5).map(i => (s"ref$i", "en", 100L)) ++
        (0 until 4).map(i => (s"cur$i", "en", 100L)) ++
        Seq(("curz", "zh", 100L)) // zh only in cur
    val d = rows.toDF("id", "lang", "n_chars")
      .withColumn("snap",
        when(col("id").startsWith("ref"), "ref").otherwise("cur"))
    val zh = QcQueries.driftReport(d)
      .filter(col("feature") === "lang" && col("bucket") === "zh")
      .as[(String, String, Double, Double, Double)].head()
    assert(zh._3 == 0.0 && zh._4 == 0.2)
    assert(!zh._5.isInfinite && !zh._5.isNaN && zh._5 > 0)
  }
}
