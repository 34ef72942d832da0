package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF tier): overlapping token
  * windows as a 1 → N `Generator`.
  *
  * The compositional form — `posexplode(sequence(...))` + `slice` +
  * `concat_ws` — builds the start-index array, then re-slices the
  * token array per chunk. This generator walks the token array once
  * per document and streams (chunk_idx, chunk_text) rows out of
  * `GenerateExec` without any intermediate arrays.
  *
  * Semantics are pinned (spec) to the q53 compositional form: starts
  * 1, 1+stride, … ≤ max(len, 1) — an empty token array still emits
  * one empty chunk, matching `sequence(1, greatest(len, 1))`. One
  * documented divergence: NULL input emits no rows (Spark's
  * `explode(null)` convention) where the compositional form's
  * `greatest(size(null), 1)` coerces null to one empty chunk.
  *
  * 100 TB note: generators run inside the scan stage — chunking is a
  * narrow transform; only the (small) chunk rows reach any shuffle.
  */
case class TokenWindows(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(size > 0 && stride > 0, "size and stride must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_tokens", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def prettyName: String = "token_windows"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) Iterator.empty
    else {
      val toks = value.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val sep = UTF8String.fromString(" ")
      Iterator.range(start = 0, end = math.max(n, 1), step = stride)
        .zipWithIndex.map { case (start, idx) =>
          val end = math.min(start + size, n)
          val parts = new Array[UTF8String](math.max(end - start, 0))
          var i = start
          while (i < end) { parts(i - start) = toks.getUTF8String(i); i += 1 }
          InternalRow(idx.toLong, parts.length.toLong,
            UTF8String.concatWs(sep, parts: _*))
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindows =
    copy(child = newChild)
}
