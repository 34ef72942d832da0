package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator Catalyst extension (builder brief route (c)): a
  * native AS-OF JOIN — logical node, planner strategy, physical
  * merge-join exec.
  *
  * Semantics (same as operators.AsOfJoin, which remains the
  * pure-DataFrame formulation): for each left row, the right row with
  * the greatest rightTs ≤ leftTs for the same key, optionally within
  * `toleranceSec`. Output = left columns ++ asof_ts ++ right value
  * columns (null when no match).
  *
  * Why a custom operator: the union+window form materializes a padded
  * union and runs a last-non-null window over every row; this exec
  * declares ClusteredDistribution on the key and (key, ts) ordering for
  * both children — EnsureRequirements inserts exactly one hash
  * exchange + sort per side — then streams a single forward merge per
  * partition with O(1) carried state. No padded rows, no window
  * buffering.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    toleranceSec: Option[Long],
    // output attrs are constructor state so exprIds survive tree copies
    asofTsOut: AttributeReference,
    rightValuesOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (asofTsOut +: rightValuesOut)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofTsOut +: rightValuesOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  def create(left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTs: Attribute, rightTs: Attribute,
      rightValues: Seq[Attribute],
      toleranceSec: Option[Long]): AsOfJoinPlan =
    AsOfJoinPlan(left, right, leftKey, rightKey, leftTs, rightTs,
      rightValues, toleranceSec,
      AttributeReference("asof_ts", TimestampType, nullable = true)(),
      rightValues.map(a =>
        AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)()))
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.rightValues,
        p.toleranceSec, p.output) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute],
    toleranceSec: Option[Long],
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val lKeyGen = BindReferences.bindReference(leftKey: Expression, left.output)
    val rKeyGen = BindReferences.bindReference(rightKey: Expression, right.output)
    val lTsGen = BindReferences.bindReference(leftTs: Expression, left.output)
    val rTsGen = BindReferences.bindReference(rightTs: Expression, right.output)
    val rValGens = rightValues.map(a =>
      BindReferences.bindReference(a: Expression, right.output))
    val nRight = rightValues.length
    val tolMicros = toleranceSec.map(_ * 1000000L)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPad = new GenericInternalRow(1 + nRight)

      // buffered right side: carries the latest right row ≤ current ts
      // for the current key
      val rBuf = rIter.buffered
      var carriedKey: Any = null
      var carriedTs: Long = 0L
      var carriedVals: Array[Any] = null

      lIter.map { lRow =>
        val k = lKeyGen.eval(lRow)
        val ts = lTsGen.eval(lRow).asInstanceOf[Long]
        // advance the right iterator while its row is usable for this
        // (key, ts): right.key < k, or right.key == k && right.ts <= ts
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rk = rKeyGen.eval(rRow)
          val cmp = keyOrd.compare(rk, k)
          if (cmp < 0) { rBuf.next(); advancing = true }
          else if (cmp == 0) {
            val rts = rTsGen.eval(rRow).asInstanceOf[Long]
            if (rts <= ts) {
              // deep-copy: shuffle iterators reuse row buffers, so any
              // value carried across next() must be owned by us
              carriedKey = InternalRow.copyValue(rk)
              carriedTs = rts
              carriedVals = rValGens.map(g => InternalRow.copyValue(g.eval(rRow))).toArray
              rBuf.next()
            } else advancing = false
          } else advancing = false
        }
        val matched = carriedVals != null && keyOrd.compare(carriedKey, k) == 0 &&
          tolMicros.forall(t => ts - carriedTs <= t)
        if (matched) {
          nullPad.update(0, carriedTs)
          var i = 0
          while (i < nRight) { nullPad.update(i + 1, carriedVals(i)); i += 1 }
        } else {
          var i = 0
          while (i <= nRight) { nullPad.update(i, null); i += 1 }
        }
        proj(joined(lRow, nullPad))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
