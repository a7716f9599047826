package graft.functions.expressions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most k counters,
  * any item with true frequency > n/(k+1) is GUARANTEED present, and every
  * reported count is a lower bound within n/(k+1) of the true count.
  *
  * This is the heavy-hitters operator for when exact per-key counting
  * stops scaling: a groupBy(token).count over 100 TB of n-grams shuffles
  * the full billion-key vocabulary, while this aggregate ships ONE
  * k-entry buffer per partition and map-side combines. The exact pattern
  * at scale is two-phase: MG candidates (k sized so n/(k+1) is below the
  * target threshold → candidate set provably complete), then an exact
  * recount of just the ≤k candidates — q108 pins that equivalence against
  * a plain GROUP BY/HAVING oracle.
  *
  * Output: array<struct<item string, count long>> sorted (count desc,
  * item asc). Null items are skipped.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1, "k must be >= 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], item: String, w: Long): Unit =
    MisraGriesAgg.offer(buf, item, w, k)

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest counter from all; keep positives.
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(k)
      val kept = buf.filter(_._2 > cut).mapValuesInPlace((_, c) => c - cut)
      buf.clear()
      kept.foreach { case (item, c) => buf.update(item, c) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** The MG offer step, shared between this aggregate and the streaming
    * twin ([[graft.streaming.HeavyHittersStream]]) so both paths apply
    * the identical decrement rule to the identical sequence.
    */
  def offer(buf: mutable.HashMap[String, Long], item: String, w: Long,
      k: Int): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < k => buf.update(item, w)
      case None =>
        // Decrement-all by the offered weight (capped at the min counter
        // so no counter goes negative in one step; loop for the rest).
        var remaining = w
        while (remaining > 0 && buf.get(item).isEmpty) {
          if (buf.size < k) { buf.update(item, remaining); remaining = 0 }
          else {
            val dec = math.min(remaining, buf.valuesIterator.min)
            remaining -= dec
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace((_, c) => c - dec)
            buf.foreach { case (key, c) => if (c == 0) dead += key }
            dead.foreach(buf.remove)
            if (dec == 0) remaining = 0 // all counters already > remaining
          }
        }
    }
  }
}
