package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a pre-built Bloom filter, as a codegen
  * expression with the filter attached as a reference object (the
  * same pattern as VecLshKeys' plane matrix): the ~1-byte-per-item
  * bitset ships to executors once inside the serialized plan, and the
  * probe runs inside WholeStageCodegen.
  *
  * This is the at-scale decontamination/filter-pushdown shape: where
  * q55 broadcasts the eval n-gram DICTIONARY (exact, but O(items ×
  * string) memory), a Bloom probe needs O(items) BITS, trades a
  * bounded false-positive rate, and can never produce a false
  * negative — safe for "definitely-clean" filtering with an exact
  * recheck only on the hits. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContain(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
