package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct sketch (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"; Beyer et al. 2007 for
  * the unbiased (k−1)·M/h₍k₎ estimator and set-operation algebra): the k
  * SMALLEST DISTINCT values of the input column, sorted ascending.
  *
  * The caller hashes ids into a uniform domain [0, M) first (the house
  * affine map ((x·1000003 + 17) mod 1000000007, a bijection on [0, P)
  * for prime P — distinct ids stay distinct). The sketch then answers:
  *
  *  - distinct count: exact (= sketch size) while NDV < k; estimated as
  *    (k−1)·M div h₍k₎ once saturated,
  *  - set algebra WITHOUT re-scanning: the k smallest of A ∪ B come
  *    from merging the two sketches, and the Jaccard of the union's
  *    k-sample estimates |A ∩ B| — the θ-sketch trick HLL cannot do
  *    (HLL unions but never intersects).
  *
  * Versus the engine's other cardinality tools: approx_count_distinct
  * (HLL) is smaller but opaque-binary, engine-specific, and union-only;
  * exact count(DISTINCT) is the EXPAND shuffle this avoids. KMV is the
  * deterministic middle: mergeable (set-union + trim — exact,
  * order-independent, repartition-stable), integer-only, and replayable
  * by any engine with a window function, so the oracle hash-compares
  * the WHOLE sketch (q267).
  *
  * Scale shape: one k-long buffer per (group, partition), map-side
  * combined; 100 TB of ids ship as k longs per group instead of an
  * EXPAND or a per-id shuffle. k = 256–4096 gives ~2–8% relative error
  * (1/√(k−2)).
  *
  * Nulls are skipped; negative values rejected loudly (the hash domain
  * contract). Output: array<long>, ascending, length min(k, NDV).
  */
case class KminSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {
  require(k >= 2, s"kmin_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmin_sketch expects a bigint column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def offer(buf: java.util.TreeSet[Long], x: Long): Unit = {
    if (x < 0L)
      throw new IllegalArgumentException(
        s"kmin_sketch values must be non-negative hashes, got $x")
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last()) {
      if (buf.add(x)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[Long],
                      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
                     other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < bytes.length / 8) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KminSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KminSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}
