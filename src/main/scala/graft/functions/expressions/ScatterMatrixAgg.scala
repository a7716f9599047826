package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point mean-centered scatter matrix of a vector column: with
  * X_ij = round(x_ij · scale) (round half away from zero — the
  * [[FixedPointVectorSum]] semantics, so the two-pass chain shares one
  * rounding) and the caller-supplied fixed-point means m_j, accumulates
  *
  *   Q_jk = Σ_i (X_ij − m_j)(X_ik − m_k)   for j <= k
  *
  * as longs — the upper triangle of n·Cov in scale² units. Centering
  * INSIDE the aggregate is what keeps 100 TB in range: |X − m| is
  * bounded by the data's value range (≈ 2·scale·|x|_max), independent
  * of row count, so Q only grows linearly in n — the raw-moment form
  * (n·ΣXX − S·Sᵀ) overflows long at n ≈ 10⁷ for unit-range data, this
  * form at n ≈ 10¹² (bound: n · (2·scale·|x|_max)² < 2⁶³).
  *
  * Buffer is d(d+1)/2 + 1 longs regardless of group size; map-side
  * combine is plain element-wise addition (associative, commutative —
  * partition-order-independent, so relational replays are exact).
  * Dimensionality is pinned by `means` up front; a mismatched vector
  * fails loudly. Null vectors are skipped.
  *
  * Output: struct(q array<long> — row-major upper triangle, n long).
  */
case class ScatterMatrixAgg(
    child: Expression,
    means: Seq[Long],
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScatterMatrixAgg.Buffer] {
  require(scale > 0, "scale must be positive")
  require(means.nonEmpty, "means must be non-empty (it pins the dimensionality)")

  import ScatterMatrixAgg.Buffer

  private val d = means.length
  private val m = means.toArray

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"scatter_matrix expects array<float|double>, got $t")
  }

  override def createAggregationBuffer(): Buffer = new Buffer(d)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val raw = child.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"vector dimensionality mismatch: expected $d, got ${arr.numElements()}")
      val c = new Array[Long](d)
      var j = 0
      while (j < d) {
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        val p = x * scale
        val r = if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)
        c(j) = r.toLong - m(j)
        j += 1
      }
      // checked arithmetic: a scatter overflow (n beyond the documented
      // bound) must fail loudly, never silently corrupt the direction
      var idx = 0
      j = 0
      while (j < d) {
        val cj = c(j)
        var k = j
        while (k < d) {
          buf.q(idx) = Math.addExact(buf.q(idx), Math.multiplyExact(cj, c(k)))
          idx += 1
          k += 1
        }
        j += 1
      }
      buf.n += 1L
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < buf.q.length) {
      buf.q(i) = Math.addExact(buf.q(i), other.q(i)); i += 1
    }
    buf.n += other.n
    buf
  }

  override def eval(buf: Buffer): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buf.q.map(x => x: Any)), buf.n))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.q.length)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.q.length) { bb.putLong(buf.q(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(d)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.q.length) { buf.q(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScatterMatrixAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "scatter_matrix"
}

object ScatterMatrixAgg {
  /** Upper-triangle accumulator, d(d+1)/2 entries. */
  final class Buffer(d: Int) {
    val q: Array[Long] = new Array[Long](d * (d + 1) / 2)
    var n: Long = 0L
  }
}
