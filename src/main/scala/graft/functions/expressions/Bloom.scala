package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter hashing shared by the build aggregate and the membership
  * probe (Bloom 1970; double hashing per Kirsch & Mitzenmacher 2006:
  * pos_i = h1 + i·h2 suffices for the classic false-positive bound).
  * The two base hashes come from a splitmix64-style finalizer over the
  * 8-byte id — pure integer arithmetic, no seed tables, deterministic
  * across partitions, JVMs, and runs.
  *
  * The filter is an ordinary byte blob: mergeable by OR, broadcastable,
  * and ~4 orders of magnitude smaller than the raw id set it summarizes
  * (2^22 bits = 512 KiB covers ~10⁶ ids at k=5 under 1% FP). False
  * positives are fine in the intended use (a PREFILTER before an exact
  * verify join — see `Dedup.contaminationStatsBloom`); false negatives
  * are impossible by construction.
  */
object BloomHash {

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the `numHashes` bit positions for `id` in a long-word bitset
    * of 2^logBits bits.
    */
  def setBits(words: Array[Long], id: Long, numHashes: Int, logBits: Int): Unit = {
    val mask = (1L << logBits) - 1L
    val h1 = mix(id)
    val h2 = mix(id ^ 0x6A09E667F3BCC909L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      words((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
  }

  /** Probe a serialized filter (little-endian long words as bytes; the
    * bit count is the blob length — always a power of two).
    */
  def mightContain(blob: Array[Byte], id: Long, numHashes: Int): Boolean = {
    val mask = blob.length.toLong * 8L - 1L
    val h1 = mix(id)
    val h2 = mix(id ^ 0x6A09E667F3BCC909L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      if ((blob((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var w = 0
    while (w < words.length) {
      val v = words(w)
      var b = 0
      while (b < 8) {
        out(w * 8 + b) = ((v >>> (8 * b)) & 0xffL).toByte
        b += 1
      }
      w += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    var w = 0
    while (w < words.length) {
      var v = 0L
      var b = 0
      while (b < 8) {
        v |= (bytes(w * 8 + b) & 0xffL) << (8 * b)
        b += 1
      }
      words(w) = v
      w += 1
    }
    words
  }
}

/** Mergeable Bloom-filter build over a long id column → binary blob of
  * 2^`logBits` bits with `numHashes` probes per id. Each partition fills
  * a local bitset and partial aggregation merges them by OR — the
  * ONE-buffer-per-partition shape (like [[MisraGriesAgg]]) that replaces
  * shipping the full distinct id set. Null ids are skipped. The result
  * is identical for any partitioning/order of the input (OR is
  * commutative and idempotent), so a distributed build byte-equals a
  * single-partition one (spec-pinned).
  */
case class BloomBuildAgg(
    child: Expression,
    logBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(logBits >= 6 && logBits <= 30, s"logBits must be in [6, 30], got $logBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 << (logBits - 6))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomHash.setBits(buf, v.asInstanceOf[Long], numHashes, logBits)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomHash.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomHash.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomHash.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_build"
}

/** Membership probe against a [[BloomBuildAgg]] blob: true when every
  * probe bit for the id is set. May return true for ids never inserted
  * (the classic false-positive rate); NEVER false for an inserted id.
  * Codegen'd — one static call per row, no boxing.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects (binary, bigint), got " +
            s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(blob: Any, id: Any): Any =
    BloomHash.mightContain(blob.asInstanceOf[Array[Byte]],
      id.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, t) =>
      s"graft.functions.expressions.BloomHash.mightContain($b, $t, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}
