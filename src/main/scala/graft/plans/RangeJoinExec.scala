package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Physical range join: sort-merge sweep with a sliding right-side window.
  *
  * Requirements declared to the planner: both children clustered on the
  * join keys (EnsureRequirements inserts the hash exchanges and makes them
  * co-partitioned) and sorted by (keys..., ts) — the same machinery that
  * feeds SortMergeJoinExec.
  *
  * Per partition, both inputs arrive key-grouped and time-sorted. For each
  * left key group the matching right group is buffered (same exposure as
  * SMJ with duplicate keys); within the group a two-pointer window over
  * the buffer emits pairs with rts ∈ [lts+lo, lts+hi). Both pointers only
  * move forward per left row, so the sweep is linear in group sizes plus
  * output.
  */
case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    loMicros: Long,
    hiMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lo = loMicros
    val hi = hiMicros
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter0, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rightOut)
      val outProj = UnsafeProjection.create(schema.map(a => a: Expression), leftOut ++ rightOut)
      val joined = new JoinedRow

      // Key ordering over the projected key rows (both sides project to the
      // same types — analysis guarantees comparable key expressions).
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))

      val lIter = lIter0.buffered
      val rIter = rIter0.buffered

      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = _
        private val rGroup = ArrayBuffer.empty[InternalRow] // buffered right group
        private val rGroupTs = ArrayBuffer.empty[Long]
        private var lRow: InternalRow = _
        private var lRowTs: Long = 0L
        private var winStart = 0
        private var winPos = 0
        private var winEnd = 0
        private var ready: InternalRow = _

        private def tsOf(proj: UnsafeProjection, row: InternalRow): Long =
          proj(row).getLong(0)

        /** Advance to the next left row that has a (possibly empty) right
          * group loaded; position the window for it.
          */
        private def advance(): Unit = {
          ready = null
          while (ready == null) {
            if (lRow != null && winPos < winEnd) {
              ready = outProj(joined(lRow, rGroup(winPos)))
              winPos += 1
              return
            }
            // need a new left row
            if (!lIter.hasNext) return
            val candidate = lIter.next()
            locally { // nulls are filtered upstream by the API wrapper
              val ck = lKeyProj(candidate)
              if (curKey == null || keyOrdering.compare(ck, curKey) != 0) {
                // new key group: drop old buffer, align right iterator
                curKey = ck.copy()
                rGroup.clear(); rGroupTs.clear()
                winStart = 0; winEnd = 0
                // skip right rows with smaller keys; buffer rows of this key
                var cmp = -1
                while (rIter.hasNext && {
                  cmp = keyOrdering.compare(rKeyProj(rIter.head), curKey); cmp < 0
                }) rIter.next()
                while (rIter.hasNext &&
                  keyOrdering.compare(rKeyProj(rIter.head), curKey) == 0) {
                  val r = rIter.next().copy()
                  rGroup += r
                  rGroupTs += tsOf(rTsProj, r)
                }
              }
              lRow = candidate
              lRowTs = tsOf(lTsProj, candidate)
              // slide window: [lts+lo, lts+hi)
              val fromTs = lRowTs + lo
              val untilTs = lRowTs + hi
              while (winStart < rGroup.length && rGroupTs(winStart) < fromTs) winStart += 1
              winEnd = math.max(winEnd, winStart)
              while (winEnd < rGroup.length && rGroupTs(winEnd) < untilTs) winEnd += 1
              winPos = winStart
            }
          }
        }

        override def hasNext: Boolean = {
          if (ready == null) advance()
          ready != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = ready
          ready = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical [[RangeJoin]] to [[RangeJoinExec]].
  * Register via `spark.experimental.extraStrategies` (done by
  * graft.operators.Joins.rangeJoinMerge) or session extensions.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lk, rk, lts, rts, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, lo, hi) :: Nil
    case _ => Nil
  }
}
