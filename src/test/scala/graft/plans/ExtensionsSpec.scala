package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions plug-in path: SQL-visible vector
  * functions + the self-cosine optimizer rule, in a session built the
  * way a platform would build it (spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // a session may already exist in this JVM (shared test context);
    // extensions only apply at session construction, so clear and
    // rebuild (the SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // .config("spark.sql.extensions", classOf[GraftExtensions].getName) is
    // the production route, but it is a STATIC conf read from the
    // SparkContext — inert when a context already exists (shared test
    // JVM). withExtensions applies the same instance programmatically.
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-tests")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ext-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("vec_cosine / vec_dot usable from SQL via extensions") {
    val r = spark.sql(
      "SELECT vec_cosine(array(1.0, 0.0), array(0.0, 1.0)) AS c, " +
        "vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d").collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("md5_prefix_hash / token_windows usable from SQL via extensions") {
    // hash matches the hex-cast twin the DuckDB oracle uses
    val h = spark.sql(
      "SELECT md5_prefix_hash('abc', 15) AS h, " +
        "conv(substring(md5('abc'), 1, 15), 16, 10) AS twin").collect().head
    assert(h.getLong(0) == h.getString(1).toLong)
    // generator: 5 tokens, size 3, stride 2 → starts 0, 2, 4
    val w = spark.sql(
      "SELECT ci, txt FROM (SELECT array('a','b','c','d','e') AS t) " +
        "LATERAL VIEW token_windows(t, 3, 2) w AS ci, ct, txt ORDER BY ci")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(w.toSeq == Seq((0L, "a b c"), (1L, "c d e"), (2L, "e")))
    // non-literal parameter is rejected at resolution, not at runtime
    val err = intercept[Exception] {
      spark.sql("SELECT md5_prefix_hash('abc', CAST(rand() * 4 AS INT))").collect()
    }
    assert(err.getMessage.contains("literal integer"))
  }

  test("avro_encode / avro_decode usable from SQL via extensions") {
    // full SQL round trip, framing included; decode schema is a
    // literal DDL string resolved at function-resolution time. The DDL
    // must state the WIRE nullability: the encoder derived plain
    // (non-union) fields from the literal struct, so the decoder's DDL
    // says NOT NULL — nullability is a byte-level difference in Avro
    val r = spark.sql(
      "SELECT avro_decode(avro_encode(named_struct('a', 7L, 'b', 'hi'), " +
        "'Rec', 'ns', 3), 'a BIGINT NOT NULL, b STRING NOT NULL', " +
        "'Rec', 'ns', 3) AS r")
      .select("r.a", "r.b").collect().head
    assert(r.getLong(0) == 7L && r.getString(1) == "hi")
    // non-literal (non-foldable) schema DDL is rejected at resolution
    val err = intercept[Exception] {
      spark.sql("SELECT avro_decode(CAST('x' AS BINARY), " +
        "concat('a BIGINT', CAST(rand() AS STRING)), 'R', 'n')").collect()
    }
    assert(err.getMessage.contains("literal string"))
  }

  test("optimizer rule folds cosine(x, x) to 1.0") {
    import spark.implicits._
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v")
    df.createOrReplaceTempView("vecs")
    val q = spark.sql("SELECT vec_cosine(v, v) AS c FROM vecs WHERE v IS NOT NULL")
    // the rewrite happens when the column is provably non-null
    // nullable column: rule doesn't fire; kernel computes ≈1
    val out = q.collect().head.getDouble(0)
    assert(math.abs(out - 1.0) < 1e-9)
    // non-foldable, non-nullable input: OUR rule (not ConstantFolding)
    // rewrites to an exact literal 1.0
    val nn = spark.sql(
      "SELECT vec_cosine(array(CAST(id AS DOUBLE), 1.0), " +
        "array(CAST(id AS DOUBLE), 1.0)) AS c FROM range(3)")
    assert(!nn.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("veccosine"),
      nn.queryExecution.optimizedPlan.toString)
    assert(nn.collect().forall(_.getDouble(0) == 1.0))
  }
}
