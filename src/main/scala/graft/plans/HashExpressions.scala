package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static md5-prefix helper shared by the interpreted path and the
  * generated code (thread-local digest: MessageDigest is neither
  * shareable nor cheap to construct per row). */
object GraftHash {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The first `hexChars` hex digits of md5(bytes) read as a base-16
    * integer — bit-identical to Spark's
    * `conv(substring(md5(x), 1, hexChars), 16, 10)` and DuckDB's
    * `('0x' || substr(md5(x), 1, hexChars))::BIGINT`, without
    * materializing the 32-char hex string. hexChars ≤ 15 so the value
    * stays non-negative in a signed long. */
  def md5PrefixBits(bytes: Array[Byte], hexChars: Int): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(bytes)
    val full = hexChars / 2
    var v = 0L
    var i = 0
    while (i < full) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    if ((hexChars & 1) == 1) v = (v << 4) | ((h(full) & 0xf0L) >>> 4)
    v
  }
}

/** Fused `conv(substring(md5(x), 1, hexChars), 16, 10)`: md5 bytes →
  * long directly. The composed form allocates the full hex string,
  * a substring, and a base-16 parse per row — on hash-driven
  * operators (sampling, splits, shuffle order, minhash) that string
  * traffic is the per-row hot path. Values are bit-identical to the
  * composed form, so every DuckDB oracle using the hex-cast twin is
  * unaffected. Runs inside whole-stage codegen. */
case class Md5PrefixHash(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars > 0 && hexChars <= 15, "hexChars must be in 1..15")

  // Analysis-time validation (AbstractDataType / ImplicitCastInputTypes
  // are private[sql] in Spark 4): callers hash STRING keys explicitly —
  // an implicit numeric→string cast would hide which textual form is
  // being hashed, and the DuckDB twin casts explicitly too.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_hash"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.md5PrefixBits(input.asInstanceOf[UTF8String].getBytes, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.GraftHash.md5PrefixBits($c.getBytes(), $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixHash =
    copy(child = newChild)
}
