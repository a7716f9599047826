package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical node for an as-of join: for every left row, the single latest
  * right row with rightTs <= leftTs within the same key (nearest-prior
  * match; left-outer — unmatched left rows carry nulls).
  *
  * The composed formulation (union + last-ignore-nulls window,
  * graft.operators.Joins.asof) pays a sort over the union of both sides;
  * this operator sorts each side independently (the same exchanges SMJ
  * would use) and then needs only a single forward merge pass holding ONE
  * buffered right row per key — O(|L|+|R|) per partition, no window
  * state, no union-wide payload struct.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  // right columns become nullable (unmatched left rows)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: per-partition forward merge. Children arrive
  * clustered on the keys and sorted by (keys, ts); for each left row the
  * right iterator advances through rows with (key < leftKey) or
  * (key == leftKey && ts <= leftTs), keeping only the last same-key row —
  * which is exactly the as-of match.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rightOut)
      // Bind against nullable right attrs — the null-filled row for
      // unmatched left rows must project as nulls, not type defaults.
      val outProj = UnsafeProjection.create(schema.map(a => a: Expression),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val rIter = rIter0.buffered

      var lastKey: UnsafeRow = null
      var lastRight: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        // Drop the remembered match when the key group changes.
        if (lastKey != null && keyOrdering.compare(lKey, lastKey) != 0) {
          lastRight = null
        }
        lastKey = lKey.copy()
        val lTsRow = lTsProj(lRow)
        if (lTsRow.isNullAt(0)) {
          // A null left timestamp has no defined "prior" instant — emit the
          // null match rather than reading the null slot as epoch 0 (which
          // would spuriously match right rows with ts <= 1970-01-01). Nulls
          // sort first, so not advancing the right iterator here is safe.
          outProj(joined(lRow, nullRight))
        } else {
          val lTime = lTsRow.getLong(0)
          // Advance right side: consume rows with smaller key, and same-key
          // rows with ts <= left ts (remembering the most recent one).
          var advancing = true
          while (advancing && rIter.hasNext) {
            val cmp = keyOrdering.compare(rKeyProj(rIter.head), lastKey)
            if (cmp < 0) { rIter.next() } // behind: skip (its group is done)
            else if (cmp == 0 && rTsProj(rIter.head).getLong(0) <= lTime) {
              lastRight = rIter.next().copy()
            } else advancing = false
          }
          outProj(joined(lRow, if (lastRight == null) nullRight else lastRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}
