package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Position-wise FIXED-POINT sum of a vector column: each element
  * contributes round(x · scale) to a long accumulator (round half away
  * from zero — the semantics of Spark's `round` and DuckDB's `round`, so
  * relational replays are bit-identical).
  *
  * This is the centroid-update aggregate (k-means M-step, per-class mean
  * embeddings) in its scale form: float/double sums are fold-order-
  * dependent — under Spark's nondeterministic partition merge order they
  * aren't even stable run to run — while integer sums are associative and
  * commutative, so this aggregate map-side combines freely and never
  * buffers vectors per group. The alternative relational form (posexplode
  * → per-(group, dim) sums) shuffles rows × dims scalar records; this
  * shuffles one long[dims] buffer per group per partition.
  *
  * Output: struct(sums array<long>, n long); mean(dim) =
  * (sums[dim] / scale) / n in double — one exact division chain.
  * Vectors must share one dimensionality per group (enforced loudly);
  * null vectors are skipped.
  */
case class FixedPointVectorSum(
    child: Expression,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FixedPointVectorSum.Buffer] {
  require(scale > 0, "scale must be positive")

  import FixedPointVectorSum.Buffer

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"fixed_point_vector_sum expects array<float|double>, got $t")
  }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val raw = child.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](d)
      else require(buf.sums.length == d,
        s"vector dimensionality mismatch: ${buf.sums.length} vs $d")
      var i = 0
      while (i < d) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val p = x * scale
        // round half AWAY from zero (Math.round rounds half toward +inf,
        // which would diverge from SQL round on negatives)
        val r = if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)
        buf.sums(i) += r.toLong
        i += 1
      }
      buf.n += 1L
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.sums != null) {
      if (buf.sums == null) {
        buf.sums = other.sums.clone()
      } else {
        require(buf.sums.length == other.sums.length,
          s"vector dimensionality mismatch: ${buf.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sums = if (buf.sums == null) Array.empty[Long] else buf.sums
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sums.map(x => x: Any)), buf.n))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val d = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + 8 * d)
    bb.putLong(buf.n)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putLong(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer
    buf.n = bb.getLong
    val d = bb.getInt
    if (buf.n > 0 || d > 0) {
      buf.sums = new Array[Long](d)
      var i = 0
      while (i < d) { buf.sums(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedPointVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedPointVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FixedPointVectorSum =
    copy(child = newChildren(0))

  override def prettyName: String = "fixed_point_vector_sum"
}

object FixedPointVectorSum {
  /** null sums = no vectors seen yet (dimensionality unknown). */
  final class Buffer {
    var sums: Array[Long] = _
    var n: Long = 0L
  }
}
