package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count–Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") over LONG
  * item ids: a depth × width grid of counters; item x increments one
  * counter per row via the pairwise-independent affine family
  * h_i(x) = ((a_i·x + b_i) mod P) mod width (Carter–Wegman; the house
  * (a, b) pairs from [[MinHashSignature]], P = 2³¹−1, valid for ids in
  * [0, P)). A point estimate is min_i grid[i][h_i(x)] — never below the
  * true count, above it by at most εn (ε = e/width) with probability
  * 1−e^−depth per query.
  *
  * This is the sketch-family complement to [[MisraGriesAgg]]: MG answers
  * "which items are heavy" (top-k identity, lower-bound counts) in a
  * k-entry buffer that cannot estimate a NAMED item's frequency once it
  * falls out; count-min answers "how often does THIS item occur" for any
  * probe, at the cost of carrying depth·width counters. Both are
  * mergeable: partials combine map-side (elementwise add — exact, no
  * approximation in the merge itself), so 100 TB of tokens ship as one
  * depth×width long grid per partition instead of a billion-key shuffle.
  *
  * Determinism: fixed hash family, integer counters, order-independent
  * updates — the DuckDB oracle replays the exact grid (q214). Null ids
  * are skipped; negative ids rejected at eval of the first offending row
  * (the CW family needs x in [0, P); content ids from polyHash are).
  *
  * Output: array<long> of length depth·width, row-major.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= MinHashSignature.AS.length,
    s"depth must be in [1, ${MinHashSignature.AS.length}]")
  require(width >= 2, s"width must be >= 2, got $width")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"count_min expects a bigint id column, got ${child.dataType.catalogString}")

  private val P = MinHashSignature.M

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x < 0L || x >= P)
        throw new IllegalArgumentException(
          s"count_min ids must be in [0, $P), got $x")
      var i = 0
      while (i < depth) {
        val b = ((MinHashSignature.AS(i) * x + MinHashSignature.BS(i)) % P % width).toInt
        buf(i * width + b) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "count_min"
}
