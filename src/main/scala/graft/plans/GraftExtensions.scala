package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions entry point for the engine's Catalyst
  * additions — the plug-in route for clusters where the session is
  * built by the platform:
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Injects the vector expressions as SQL functions and the optimizer
  * rule below. (In-code sessions can equally call
  * `VectorFunctions.register`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[VecCosine].getName, "vec_cosine"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecCosine(es.head, es(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[VecDot].getName, "vec_dot"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecDot(es.head, es(1))))
    // cross-engine 60/32-bit hashing (fingerprints, splits, sampling)
    // and the streaming chunk generator, for pure-SQL pipelines:
    //   SELECT md5_prefix_hash(doc_id::STRING, 15) % 100 ...
    //   SELECT ... FROM docs LATERAL VIEW token_windows(toks, 40, 30) w
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("md5_prefix_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Md5PrefixHash].getName, "md5_prefix_hash"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Md5PrefixHash(es.head, foldedInt(es(1), "md5_prefix_hash(_, hexChars)"))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("token_windows"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TokenWindows].getName, "token_windows"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          TokenWindows(es.head,
            foldedInt(es(1), "token_windows(_, size, _)"),
            foldedInt(es(2), "token_windows(_, _, stride)"))))
    // Avro wire-format codec for pure-SQL pipelines; the decode target
    // schema and record identity are compile-time literals:
    //   SELECT avro_encode(named_struct('a', a), 'Rec', 'ns')
    //   SELECT avro_decode(payload, 'a BIGINT, b STRING', 'Rec', 'ns').*
    // Nullability caveat: named_struct's fields are all nullable to
    // Catalyst, so 3/4-arg SQL avro_encode derives every field as a
    // [null, T] union — a byte-level DIFFERENT wire layout from a
    // Scala-path encode whose wireSchema pins required fields. To emit
    // wire-pinned bytes from SQL, pass the wire contract as a 5th DDL
    // literal (mirroring avro_decode's schemaDdl; `NOT NULL` marks a
    // required field):
    //   SELECT avro_encode(named_struct('a', a), 'Rec', 'ns', 7,
    //                      'a BIGINT NOT NULL')
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("avro_encode"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[AvroEncode].getName, "avro_encode"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          AvroEncode(es.head,
            foldedString(es(1), "avro_encode(_, recordName, _)"),
            foldedString(es(2), "avro_encode(_, _, namespace)"),
            schemaId = if (es.length > 3)
              foldedInt(es(3), "avro_encode(_, _, _, schemaId)") else -1,
            wireSchema = if (es.length > 4)
              Some(org.apache.spark.sql.types.StructType.fromDDL(
                foldedString(es(4), "avro_encode(..., wireSchemaDdl)")))
            else None)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("avro_decode"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[AvroDecode].getName, "avro_decode"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          AvroDecode(es.head,
            org.apache.spark.sql.types.StructType.fromDDL(
              foldedString(es(1), "avro_decode(_, schemaDdl, _)")),
            foldedString(es(2), "avro_decode(_, _, recordName, _)"),
            foldedString(es(3), "avro_decode(_, _, _, namespace)"),
            schemaId = if (es.length > 4)
              foldedInt(es(4), "avro_decode(..., schemaId)") else -1,
            failOnError = true)))
    ext.injectOptimizerRule(_ => SimplifySelfCosine)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }

  private def foldedString(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      where: String): String = {
    require(e.foldable, s"$where must be a literal string")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$where must be a literal string, got $other")
    }
  }

  /** Extract a literal int argument at function-resolution time —
    * these expressions take compile-time parameters, not columns. */
  private def foldedInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      where: String): Int = {
    require(e.foldable, s"$where must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$where must be a literal integer, got $other")
    }
  }
}

/** Optimizer rule: cosine(x, x) ≡ 1.0 for any non-null x (up to float
  * error the kernel itself would produce on the identical loop) — a
  * real rewrite for normalize-then-compare pipelines where a self-join
  * degenerates. Demonstrates the `Rule[LogicalPlan]` extension surface
  * (SURVEY §7.3: rely on Catalyst built-ins otherwise). */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VecCosine(a, b) if a.deterministic && b.deterministic &&
          a.semanticEquals(b) && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}
