package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.graftbridge.SpillableRowBuffer

/** Per-partition merge scanners for the custom sort-merge execs — the
  * Scala half of their whole-stage-codegen integration (the pattern of
  * Spark's own SortMergeJoinExec + its scanner): the generated code drives
  * a plain `advanceNext()/getLeft/getRight` loop and consumes column
  * values straight out of the two current rows, so the per-pair output
  * projection of the interpreted path disappears and everything downstream
  * fuses into the same span.
  *
  * Both scanners assume children arrive clustered on the join keys and
  * sorted by (keys..., ts) — enforced by the execs'
  * requiredChildDistribution/Ordering.
  */
final class RangeJoinScanner(
    lIter0: Iterator[InternalRow],
    rIter0: Iterator[InternalRow],
    lKeyProj: UnsafeProjection,
    rKeyProj: UnsafeProjection,
    lTsProj: UnsafeProjection,
    rTsProj: UnsafeProjection,
    rRowProj: UnsafeProjection,
    keyOrdering: Ordering[InternalRow],
    lo: Long,
    hi: Long,
    inMemoryRowsThreshold: Int,
    spillRowsThreshold: Int,
    spillSizeThreshold: Long) {

  private val lIter = lIter0
  private val rIter = rIter0.buffered
  private var curKey: UnsafeRow = _
  // Buffered right group — spill-capable (the SortMergeJoinExec group
  // buffer), so a hot key whose group exceeds executor memory degrades to
  // disk instead of OOMing. Window bounds come from two monotone peek
  // iterators instead of a parallel in-heap timestamp array, so NOTHING
  // about the group stays O(group) on the heap.
  private val rGroup = new SpillableRowBuffer(
    inMemoryRowsThreshold, spillRowsThreshold, spillSizeThreshold)
  private var lRow: InternalRow = _
  // Window [winStart, winEnd) over the buffered group; both bounds only
  // move forward per left row (left rows are ts-sorted within a key).
  private var winStart = 0
  private var winEnd = 0
  private var startIter: Iterator[UnsafeRow] = _
  private var startTs = 0L // ts of the row at index winStart (when valid)
  private var startValid = false
  private var endIter: Iterator[UnsafeRow] = _
  private var endTs = 0L // ts of the row at index winEnd (when valid)
  private var endValid = false
  private var emitIter: Iterator[UnsafeRow] = _
  private var emitRemaining = 0
  private var curRight: InternalRow = _

  def getLeft: InternalRow = lRow
  def getRight: InternalRow = curRight

  private def advanceStartPeek(): Unit =
    if (startIter.hasNext) {
      startTs = rTsProj(startIter.next()).getLong(0); startValid = true
    } else startValid = false

  private def advanceEndPeek(): Unit =
    if (endIter.hasNext) {
      endTs = rTsProj(endIter.next()).getLong(0); endValid = true
    } else endValid = false

  /** Advance to the next (left, right) in-range pair; window pointers only
    * move forward per left row (linear in group sizes plus output).
    */
  def advanceNext(): Boolean = {
    while (true) {
      if (lRow != null && emitRemaining > 0) {
        curRight = emitIter.next()
        emitRemaining -= 1
        return true
      }
      // need a new left row
      if (!lIter.hasNext) return false
      val candidate = lIter.next()
      val ck = lKeyProj(candidate)
      if (curKey == null || keyOrdering.compare(ck, curKey) != 0) {
        // new key group: drop old buffer, align right iterator
        curKey = ck.copy()
        rGroup.clear()
        winStart = 0; winEnd = 0
        while (rIter.hasNext &&
          keyOrdering.compare(rKeyProj(rIter.head), curKey) < 0) rIter.next()
        while (rIter.hasNext &&
          keyOrdering.compare(rKeyProj(rIter.head), curKey) == 0) {
          rGroup.add(toUnsafe(rIter.next())) // add() copies the bytes
        }
        startIter = rGroup.iterator; advanceStartPeek()
        endIter = rGroup.iterator; advanceEndPeek()
      }
      lRow = candidate
      // slide window: [lts+lo, lts+hi)
      val lRowTs = lTsProj(candidate).getLong(0)
      val fromTs = lRowTs + lo
      val untilTs = lRowTs + hi
      while (startValid && startTs < fromTs) { winStart += 1; advanceStartPeek() }
      while (winEnd < winStart) { winEnd += 1; advanceEndPeek() }
      while (endValid && endTs < untilTs) { winEnd += 1; advanceEndPeek() }
      emitRemaining = winEnd - winStart
      if (emitRemaining > 0) emitIter = rGroup.iteratorFrom(winStart)
    }
    false // unreachable
  }

  private def toUnsafe(r: InternalRow): UnsafeRow = r match {
    case u: UnsafeRow => u
    case other => rRowProj(other)
  }
}

/** Serializable per-partition factory: projections and the key ordering
  * must be constructed on the executor (once per partition), both by the
  * interpreted path and by the generated code's init.
  */
final class RangeJoinScannerFactory(
    lKeys: Seq[Expression], rKeys: Seq[Expression],
    lTs: Expression, rTs: Expression,
    leftOut: Seq[Attribute], rightOut: Seq[Attribute],
    lo: Long, hi: Long,
    inMemoryRowsThreshold: Int,
    spillRowsThreshold: Int,
    spillSizeThreshold: Long) extends Serializable {
  def create(l: Iterator[InternalRow], r: Iterator[InternalRow]): RangeJoinScanner =
    new RangeJoinScanner(
      l, r,
      UnsafeProjection.create(lKeys, leftOut),
      UnsafeProjection.create(rKeys, rightOut),
      UnsafeProjection.create(Seq(lTs), leftOut),
      UnsafeProjection.create(Seq(rTs), rightOut),
      UnsafeProjection.create(rightOut.map(a => a: Expression), rightOut),
      RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType)),
      lo, hi,
      inMemoryRowsThreshold, spillRowsThreshold, spillSizeThreshold)
}

/** As-of merge: one output row per left row; `getRight` is the remembered
  * nearest-prior same-key right row or an all-null row.
  */
final class AsofJoinScanner(
    lIter: Iterator[InternalRow],
    rIter0: Iterator[InternalRow],
    lKeyProj: UnsafeProjection,
    rKeyProj: UnsafeProjection,
    lTsProj: UnsafeProjection,
    rTsProj: UnsafeProjection,
    keyOrdering: Ordering[InternalRow],
    nRightFields: Int) {

  private val rIter = rIter0.buffered
  private val nullRight = new GenericInternalRow(nRightFields)
  private var lastKey: UnsafeRow = _
  private var lastRight: InternalRow = _
  private var lRow: InternalRow = _
  private var curRight: InternalRow = _

  def getLeft: InternalRow = lRow
  def getRight: InternalRow = curRight

  def advanceNext(): Boolean = {
    if (!lIter.hasNext) return false
    lRow = lIter.next()
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
      curRight = nullRight
      return true
    }
    val lTime = lTsRow.getLong(0)
    // Advance right side: consume rows with smaller key, and same-key rows
    // with ts <= left ts (remembering the most recent one).
    var advancing = true
    while (advancing && rIter.hasNext) {
      val cmp = keyOrdering.compare(rKeyProj(rIter.head), lastKey)
      if (cmp < 0) { rIter.next() } // behind: skip (its group is done)
      else if (cmp == 0 && rTsProj(rIter.head).getLong(0) <= lTime) {
        lastRight = rIter.next().copy()
      } else advancing = false
    }
    curRight = if (lastRight == null) nullRight else lastRight
    true
  }
}

final class AsofJoinScannerFactory(
    lKeys: Seq[Expression], rKeys: Seq[Expression],
    lTs: Expression, rTs: Expression,
    leftOut: Seq[Attribute], rightOut: Seq[Attribute]) extends Serializable {
  def create(l: Iterator[InternalRow], r: Iterator[InternalRow]): AsofJoinScanner =
    new AsofJoinScanner(
      l, r,
      UnsafeProjection.create(lKeys, leftOut),
      UnsafeProjection.create(rKeys, rightOut),
      UnsafeProjection.create(Seq(lTs), leftOut),
      UnsafeProjection.create(Seq(rTs), rightOut),
      RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType)),
      rightOut.length)
}
