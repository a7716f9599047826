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
  * which is exactly the as-of match. The merge lives in
  * [[AsofJoinScanner]], shared by the interpreted path and the
  * whole-stage-codegen path (the SortMergeJoinExec pattern: generated code
  * drives the scanner and consumes columns from the current row pair, so
  * downstream operators fuse with no per-row output projection).
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  private def scannerFactory = new AsofJoinScannerFactory(
    leftKeys, rightKeys, leftTs, rightTs, left.output, right.output)

  override protected def doExecute(): RDD[InternalRow] = {
    val factory = scannerFactory
    val schema = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val scanner = factory.create(lIter, rIter)
      // Bind against nullable right attrs — the null-filled row for
      // unmatched left rows must project as nulls, not type defaults.
      val outProj = UnsafeProjection.create(schema.map(a => a: Expression),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) ready = scanner.advanceNext()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          ready = false
          outProj(joined(scanner.getLeft, scanner.getRight))
        }
      }
    }
  }

  // ---- whole-stage codegen ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String = {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val factoryName = classOf[AsofJoinScannerFactory].getName
    val scannerName = classOf[AsofJoinScanner].getName
    val factoryRef = ctx.addReferenceObj("asofJoinFactory", scannerFactory, factoryName)
    val scanner = ctx.addMutableState(scannerName, "asofJoinScanner",
      v => s"$v = $factoryRef.create(inputs[0], inputs[1]);", forceInline = true)
    val leftRow = ctx.addMutableState("InternalRow", "asofJoinLeftRow")
    val rightRow = ctx.addMutableState("InternalRow", "asofJoinRightRow")

    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // Right side reads may hit the all-null row — generate with
    // nullability forced on, whatever the child claims.
    ctx.INPUT_ROW = rightRow
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, nullable = true).genCode(ctx)
    }
    ctx.INPUT_ROW = null
    s"""
       |while ($scanner.advanceNext()) {
       |  $leftRow = $scanner.getLeft();
       |  $rightRow = $scanner.getRight();
       |  ${consume(ctx, leftVars ++ rightVars).trim}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
