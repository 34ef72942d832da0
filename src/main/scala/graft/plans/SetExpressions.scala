package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_intersect_count(a, b)`: |A ∩ B| for two SORTED arrays (as
  * produced by `sort_array`), by a single merge walk — O(|a|+|b|),
  * zero allocation, whole-stage codegen.
  *
  * The built-in route — `size(array_intersect(a, b))` — builds a hash
  * set per ROW through the interpreted eval path (boxing every
  * element); for similarity-join verification (|candidate pairs| ≫
  * |docs|) that per-row overhead dominates the query (measured: 3.5 s
  * for 197k pairs at sf0.1 vs <0.2 s for this merge walk).
  *
  * Inputs MUST be sorted ascending with distinct elements (set
  * semantics) — the producer in this codebase is always
  * `sort_array(collect_list(...))` over a distinct-ed table. Both
  * sides must sort under the same ordering (Spark's binary UTF8
  * ordering for strings), which `sort_array` guarantees.
  *
  * NULL ELEMENTS are not set members and are skipped (the function is
  * SQL-registered, so arbitrary `containsNull=true` arrays can reach
  * it — e.g. a literal `array('a', NULL)`; without the skip they NPE
  * in the interpreted path and read garbage in codegen). The null
  * checks are emitted ONLY when the input type says containsNull, so
  * the in-repo hot path — `sort_array(collect_list(...))`, which is
  * containsNull=false — keeps the branch-free merge loop.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def nullableElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two ARRAY<STRING> or two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val (skipA, skipB) = (nullableElems(left), nullableElems(right))
    var i = 0; var j = 0; var c = 0
    elem(left) match {
      case StringType =>
        while (i < na && j < nb) {
          if (skipA && a.isNullAt(i)) i += 1
          else if (skipB && b.isNullAt(j)) j += 1
          else {
            val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
            if (cmp == 0) { c += 1; i += 1; j += 1 }
            else if (cmp < 0) i += 1
            else j += 1
          }
        }
      case _ =>
        while (i < na && j < nb) {
          if (skipA && a.isNullAt(i)) i += 1
          else if (skipB && b.isNullAt(j)) j += 1
          else {
            val x = a.getLong(i); val y = b.getLong(j)
            if (x == y) { c += 1; i += 1; j += 1 }
            else if (x < y) i += 1
            else j += 1
          }
        }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val getA = CodeGenerator.getValue(a, elem(left), i)
      val getB = CodeGenerator.getValue(b, elem(right), j)
      // null-element skips, emitted only for containsNull inputs —
      // the containsNull=false hot path compiles to the bare merge
      val skipA =
        if (nullableElems(left)) s"if ($a.isNullAt($i)) { $i++; continue; }" else ""
      val skipB =
        if (nullableElems(right)) s"if ($b.isNullAt($j)) { $j++; continue; }" else ""
      val step = elem(left) match {
        case StringType =>
          val cmp = ctx.freshName("cmp")
          s"""int $cmp = $getA.compareTo($getB);
             |  if ($cmp == 0) { $c++; $i++; $j++; }
             |  else if ($cmp < 0) $i++;
             |  else $j++;""".stripMargin
        case _ =>
          val x = ctx.freshName("x")
          val y = ctx.freshName("y")
          s"""long $x = $getA; long $y = $getB;
             |  if ($x == $y) { $c++; $i++; $j++; }
             |  else if ($x < $y) $i++;
             |  else $j++;""".stripMargin
      }
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  $skipA
         |  $skipB
         |  $step
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** SQL registration so the expression is usable from spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", es => SortedIntersectCount(es.head, es(1)), "built-in")
}
