package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray
import org.apache.spark.sql.internal.SQLConf

/** Access-widening facade over Spark's `private[sql]`
  * [[ExternalAppendOnlyUnsafeRowArray]] — the spill-capable append-only
  * row buffer SortMergeJoinExec and WindowExec use for their key-group
  * buffers. Below `inMemoryRowsThreshold` rows it is a plain in-heap
  * array with O(1) positioned iterators; past it rows move into an
  * `UnsafeExternalSorter` that spills to disk under memory pressure (or
  * unconditionally past `spillRowsThreshold`/`spillSizeThreshold`), so a
  * hot key whose group exceeds executor memory degrades to disk instead
  * of OOMing the task.
  *
  * Must be constructed on an executor inside a task (the underlying array
  * grabs `TaskContext.get()`); `add` copies the row bytes, so callers may
  * pass reused projection buffers. Iterators are invalidated by
  * `add`/`clear` and return reused `UnsafeRow`s — extract or copy before
  * the next call.
  */
final class SpillableRowBuffer(
    inMemoryRowsThreshold: Int,
    spillRowsThreshold: Int,
    spillSizeThreshold: Long) {
  // Arg order per the 4-arg ctor: (numRowsInMemoryBufferThreshold,
  // maxSizeInMemoryBufferThreshold, numRowsSpillThreshold,
  // maxSizeSpillThreshold) — WindowExec passes the spill size for both
  // size slots; mirror it.
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemoryRowsThreshold, spillSizeThreshold, spillRowsThreshold, spillSizeThreshold)

  def add(row: UnsafeRow): Unit = arr.add(row)
  def clear(): Unit = arr.clear()
  def length: Int = arr.length
  def isEmpty: Boolean = arr.isEmpty
  /** Bytes spilled to disk so far (0 while fully in-memory). */
  def spillSize: Long = arr.spillSize
  /** Iterator over rows [startIndex, length). O(1) positioning while
    * in-memory; a spilled buffer replays and skips `startIndex` rows.
    */
  def iteratorFrom(startIndex: Int): Iterator[UnsafeRow] =
    arr.generateIterator(startIndex)
  def iterator: Iterator[UnsafeRow] = arr.generateIterator()
}

object SpillableRowBuffer {
  /** The three SortMergeJoinExec buffer knobs from the session conf —
    * read on the driver at plan time, pass the values into per-partition
    * factories.
    */
  def smjThresholds(conf: SQLConf): (Int, Int, Long) = (
    conf.sortMergeJoinExecBufferInMemoryThreshold,
    conf.sortMergeJoinExecBufferSpillThreshold,
    conf.sortMergeJoinExecBufferSpillSizeThreshold)
}
