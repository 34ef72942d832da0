package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType}

/** Shared element access for vector expressions: one supported-type
  * list used by analysis-time validation, the interpreted path, and
  * codegen — so the three can never disagree on what's accepted. */
trait VecElementSupport { self: Expression =>

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def isSupportedElem(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType | _: DecimalType => true
    case _ => false
  }

  /** Analysis-time check: `e` must be an array of a supported numeric
    * element type — misuse fails in checkAnalysis, not at execution. */
  protected def checkVecInput(e: Expression, side: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(t, _) if isSupportedElem(t) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$side of ${self.prettyName} must be ARRAY<FLOAT|DOUBLE|INT|BIGINT|DECIMAL>, got ${other.sql}")
    }

  protected def elemAsDouble(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element $other")
  }

  /** Codegen fragment converting one element access to double. */
  protected def genElemAsDouble(access: String, t: DataType): String = t match {
    case _: DecimalType => s"$access.toDouble()"
    case _ => s"(double) $access"
  }
}

/** Native Catalyst vector expressions with whole-stage codegen.
  *
  * The built-in route for vector math — `aggregate(zip_with(...))` —
  * is a CodegenFallback: every row interprets a lambda tree and
  * allocates an intermediate array. For pairwise similarity
  * (|pairs| ≫ |rows|) that interpretation dominates the query
  * (measured: 80 s for 125 k cosine pairs at sf0.1; see BASELINE.md).
  * These expressions emit a single fused loop — dot, |a|², |b|² in one
  * pass, no allocation — and run inside WholeStageCodegen.
  *
  * Semantics match the HOF/DuckDB-oracle formulation exactly:
  * left-to-right double-precision accumulation, cos = dot/(√na·√nb).
  */
abstract class VecBinaryExpression extends BinaryExpression
    with VecElementSupport {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInput(left, "left input") match {
      case TypeCheckResult.TypeCheckSuccess => checkVecInput(right, "right input")
      case fail => fail
    }
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) in one fused pass. */
case class VecCosine(left: Expression, right: Expression)
    extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elemAsDouble(a, i, ta)
      val y = elemAsDouble(b, i, tb)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genElemAsDouble(getA, elemType(left))};
         |  double $y = ${genElemAsDouble(getB, elemType(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) = Σaᵢbᵢ — for LSH hyperplane projections. */
case class VecDot(left: Expression, right: Expression)
    extends VecBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += elemAsDouble(a, i, ta) * elemAsDouble(b, i, tb)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${genElemAsDouble(getA, elemType(left))} *
         |    ${genElemAsDouble(getB, elemType(right))};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosine(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Array of LSH bucket keys, one per hash table (plane matrix laid
    * out as numTables × numPlanes consecutive rows). */
  def vec_lsh_keys(v: Column, planes: IndexedSeq[IndexedSeq[Double]],
      numPlanes: Int): Column =
    GraftColumnBridge.column(VecLshKeys(GraftColumnBridge.expression(v),
      planes, numPlanes))

  /** SQL registration so the expressions are usable from spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", es => VecCosine(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", es => VecDot(es.head, es(1)), "built-in")
  }
}

/** All LSH bucket keys for one vector in a single fused pass:
  * key(t) = Σ_p [dot(v, plane(t,p)) > 0] · 2^p for every hash table t.
  *
  * The composed form — numTables × numPlanes separate VecDot nodes
  * against 64-element array literals — codegens thousands of lines and
  * walks the vector 48× per row; this walks it once per plane with the
  * plane matrix held as a single reference object. Plane rows are
  * value-equal `IndexedSeq`s so expression canonicalization still
  * dedups identical nodes.
  */
case class VecLshKeys(child: Expression,
    planes: IndexedSeq[IndexedSeq[Double]], numPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with VecElementSupport {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInput(child, "input")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def numTables: Int = planes.length / numPlanes

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val t = elemType(child)
    val keys = new Array[Long](numTables)
    var ti = 0
    while (ti < numTables) {
      var key = 0L
      var p = 0
      while (p < numPlanes) {
        val plane = matrix(ti * numPlanes + p)
        val n = math.min(plane.length, v.numElements())
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += plane(j) * elemAsDouble(v, j, t)
          j += 1
        }
        if (dot > 0) key |= (1L << p)
        p += 1
      }
      keys(ti) = key
      ti += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planes", matrix, "double[][]")
      val keys = ctx.freshName("keys")
      val ti = ctx.freshName("ti")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val key = ctx.freshName("key")
      val getV = CodeGenerator.getValue(v, elemType(child), j)
      s"""
         |long[] $keys = new long[$numTables];
         |for (int $ti = 0; $ti < $numTables; $ti++) {
         |  long $key = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double[] $plane = $m[$ti * $numPlanes + $p];
         |    int $n = java.lang.Math.min($plane.length, $v.numElements());
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $plane[$j] * ${genElemAsDouble(getV, elemType(child))};
         |    }
         |    if ($dot > 0) $key |= (1L << $p);
         |  }
         |  $keys[$ti] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gaussian-NB per-class log-likelihood fold:
  * Σᵢ r8(c0ᵢ − (xᵢ−mᵢ)²/(2·vᵢ)) over an embedding array, with the
  * trained per-dimension model as plan reference objects — the
  * codegen replacement for the `transform` + `aggregate` HOF chain in
  * streaming NB scoring (higher-order functions are CodegenFallback:
  * every scored row interprets a lambda tree and allocates the
  * 64-element contribution array).
  *
  * Determinism contract shared with the batch scorer and the HOF
  * fold: each contribution is snapped to 8 decimals with the exact
  * [[graft.operators.Num.j]] two-stage floor, accumulation is
  * left-to-right — bit-equal to both other forms (spec-pinned).
  */
case class VecGaussScore(child: Expression, m: IndexedSeq[Double],
    v: IndexedSeq[Double], c0: IndexedSeq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with VecElementSupport {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInput(child, "input")

  override def prettyName: String = "vec_gauss_score"

  @transient private lazy val (ma, va, ca) =
    (m.toArray, v.toArray, c0.toArray)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = math.min(a.numElements(), ma.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = elemAsDouble(a, i, t)
      val d = x - ma(i)
      s += graft.operators.Num.j(ca(i) - d * d / (2.0 * va(i)), 8)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mm = ctx.addReferenceObj("nbMean", ma, "double[]")
      val vv = ctx.addReferenceObj("nbVar", va, "double[]")
      val cc = ctx.addReferenceObj("nbC0", ca, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      val raw = ctx.freshName("raw")
      val getA = CodeGenerator.getValue(a, elemType(child), i)
      // the two-stage floor below IS Num.j(raw, 8): p = 1e12, f = 1e8
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $mm.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genElemAsDouble(getA, elemType(child))};
         |  double $d = $x - $mm[$i];
         |  double $raw = $cc[$i] - $d * $d / (2.0 * $vv[$i]);
         |  $s += java.lang.Math.floor(java.lang.Math.floor($raw * 1.0E12 + 0.5)
         |          / 1.0E12 * 1.0E8 + 0.5) / 1.0E8;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
