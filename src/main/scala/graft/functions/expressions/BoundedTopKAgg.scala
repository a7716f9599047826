package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k aggregate: the k strongest (value DESC, id ASC tiebreak)
  * pairs per group, as a TypedImperativeAggregate with an O(k) buffer.
  *
  * The window formulation of top-k-per-group (`row_number() over
  * (partition by g order by v) <= k`) shuffles EVERY row of the group to
  * one reducer and sorts it, just to discard all but k. This aggregate
  * keeps a k-bounded buffer per group with map-side partial combine: each
  * input partition contributes at most k pairs per group to the exchange —
  * at 100 TB the shuffle shrinks from the table size to
  * k × partitions × groups, and no per-group full sort ever happens.
  *
  * Null values or ids are skipped (rank semantics over non-null values —
  * callers with nullable order columns filter first). Output is an
  * array<struct<value double, id long>> sorted strongest-first; posexplode
  * turns position into the rank.
  */
case class BoundedTopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKAgg.Buffer] {
  require(k >= 1, "k must be >= 1")

  import BoundedTopKAgg.Buffer

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.vals(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.vals(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.vals(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "topk_agg"
}

object BoundedTopKAgg {
  /** Sorted (strongest-first) bounded buffer; O(k) insert via shift —
    * the common case (row weaker than the current k-th) is one comparison.
    */
  final class Buffer(k: Int) {
    var n: Int = 0
    val vals: Array[Double] = new Array[Double](k)
    val ids: Array[Long] = new Array[Long](k)

    private def stronger(v1: Double, i1: Long, v2: Double, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    def insert(v: Double, id: Long): Unit = {
      if (n == k && !stronger(v, id, vals(k - 1), ids(k - 1))) return
      var i = 0
      while (i < n && !stronger(v, id, vals(i), ids(i))) i += 1
      val last = math.min(n, k - 1)
      var j = last
      while (j > i) { vals(j) = vals(j - 1); ids(j) = ids(j - 1); j -= 1 }
      vals(i) = v
      ids(i) = id
      if (n < k) n += 1
    }
  }
}
