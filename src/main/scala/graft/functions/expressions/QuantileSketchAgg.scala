package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile summary with a DETERMINISTIC compactor — the
  * KLL-shaped levels structure (Karnin, Lang & Liberty 2016, FOCS:
  * items at level i carry weight 2^i; a full level sorts and promotes
  * half) but with the deterministic odd-index-keep rule instead of the
  * randomized coin: no RNG in an aggregation path (the house
  * determinism rule), at the cost of the weaker worst-case rank error
  * O(log(n/k)·n/k) versus the randomized O(n/k) — the classic
  * determinism/size trade, documented not hidden.
  *
  * This is the percentile operator for when the exact distributed form
  * ([[graft.operators.Percentiles]] — which range-partitions VALUES)
  * stops being the right shape: monitoring pipelines that keep one
  * bounded summary per shard/day and merge on read, and streaming state
  * (a summary is ≤ k·levels doubles regardless of stream length —
  * [[graft.streaming.QuantileStream]] holds exactly one per shard).
  *
  * The summary content depends on the MERGE ORDER (as every mergeable
  * sketch's does, HLL aside), so Spark's nondeterministic task order
  * makes raw estimates unsuitable for a hash-compared oracle; the q48
  * anchor pattern applies — emit exact in-plan anchors + "estimate
  * within the guarantee" booleans (q195), with the guarantee term
  * B = 2·(levels+1)·n/k taken from the worst-case analysis above.
  *
  * Output: struct(ests array<double>, n long, n_levels int) — ests(i)
  * is the estimated `quantiles(i)`-quantile (an actual data element);
  * null when no rows were offered.
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchAgg.Sketch] {
  require(k >= 8, "k must be >= 8")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def createAggregationBuffer(): QuantileSketchAgg.Sketch =
    new QuantileSketchAgg.Sketch(k)

  override def update(buf: QuantileSketchAgg.Sketch, input: InternalRow)
      : QuantileSketchAgg.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileSketchAgg.Sketch,
                     other: QuantileSketchAgg.Sketch): QuantileSketchAgg.Sketch = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: QuantileSketchAgg.Sketch): Any = {
    if (buf.n == 0L) return null
    val ests = quantiles.map(buf.quantile)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(ests.toArray[Any]), buf.n, buf.levels.length))
  }

  override def serialize(buf: QuantileSketchAgg.Sketch): Array[Byte] =
    QuantileSketchAgg.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketchAgg.Sketch =
    QuantileSketchAgg.fromBytes(bytes, k)

  override def dataType: DataType = StructType(Seq(
    StructField("ests", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType, nullable = false),
    StructField("n_levels", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {

  /** Wire form shared by the aggregate buffer and the streaming twin's
    * state ([[graft.streaming.QuantileStream]]): n, #levels, per-level
    * length + doubles.
    */
  def toBytes(buf: Sketch): Array[Byte] = {
    val size = 8 + 4 + buf.levels.map(l => 4 + 8 * l.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], k: Int): Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new Sketch(k)
    s.n = bb.getLong
    val nl = bb.getInt
    var i = 0
    while (i < nl) {
      val len = bb.getInt
      val l = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { l += bb.getDouble; j += 1 }
      s.levels += l
      i += 1
    }
    s
  }

  /** The levels structure, shared by the aggregate and the streaming
    * twin so both paths apply the identical compaction rule.
    */
  final class Sketch(val k: Int) {
    var n: Long = 0L
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer.empty

    private def levelAt(i: Int): ArrayBuffer[Double] = {
      while (levels.length <= i) levels += ArrayBuffer.empty[Double]
      levels(i)
    }

    def add(v: Double): Unit = {
      n += 1
      levelAt(0) += v
      compactCascade()
    }

    def mergeIn(other: Sketch): Unit = {
      n += other.n
      var i = 0
      while (i < other.levels.length) {
        levelAt(i) ++= other.levels(i)
        i += 1
      }
      compactCascade()
    }

    /** Compact every overfull level, bottom-up (a compaction can overfill
      * the level above). Deterministic: sort ascending, keep the odd
      * index of each adjacent pair (promoted with doubled weight); an
      * odd-length leftover element stays at its level, so total weight
      * is preserved exactly.
      */
    private def compactCascade(): Unit = {
      var i = 0
      while (i < levels.length) {
        val l = levels(i)
        if (l.length >= k) {
          val sorted = l.toArray
          java.util.Arrays.sort(sorted)
          val pairs = sorted.length / 2
          val up = levelAt(i + 1)
          var p = 0
          while (p < pairs) { up += sorted(2 * p + 1); p += 1 }
          l.clear()
          if (sorted.length % 2 == 1) l += sorted(sorted.length - 1)
        }
        i += 1
      }
    }

    /** Estimated q-quantile: the stored element whose cumulative weight
      * first reaches max(1, ceil(q·n)) in value order. An actual data
      * element, like percentile_approx.
      */
    def quantile(q: Double): Double = {
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      val sorted = items.sortBy(_._1)
      val total = sorted.map(_._2).sum // == n (weight-preserving compaction)
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.length) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      sorted.last._1
    }
  }
}
