package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for an event-time range join:
  *
  *   left ⋈ right  ON  left.keys = right.keys
  *                 AND right.ts ∈ [left.ts + lo, left.ts + hi)
  *
  * Spark's built-in planning of this shape is an equi-join with the range
  * as a residual predicate — correct, but every (key-matched) pair is
  * produced and then filtered. This node lets [[RangeJoinStrategy]] plan a
  * sort-merge sweep instead: both sides hash-partitioned by key and sorted
  * by (key, ts); a sliding two-pointer window emits exactly the in-range
  * pairs, O(|L| + |R| + |output|) per partition.
  *
  * `lo`/`hi` are microsecond offsets (hi exclusive). Inner join semantics;
  * rows with null keys or null timestamps never match (filtered by the
  * planner's inserted IsNotNull-style semantics upstream in the API
  * wrapper, graft.operators.Joins.rangeJoinMerge).
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    loMicros: Long,
    hiMicros: Long) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}
