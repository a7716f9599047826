package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: a document's CDC chunks as one
  * array column — `array<struct<chunk_hash long, n_tokens long>>` in
  * chunk order. A chunk boundary falls AT token p (1-based, p >= w)
  * when the poly-hash of the w-token gram ending at p is 0 mod
  * `divisor`; chunk_hash is the poly-hash of the chunk's tokens joined
  * by single spaces (identical to the relational formulation's
  * `polyHash(array_join(...))`, byte for byte).
  *
  * Fifth instance of the native-kernel rule: the per-row HOF fold this
  * replaces ([[graft.operators.Dedup.cdcChunkHashesCol]]'s old form)
  * was interpreted per TOKEN and built O(len²) intermediate strings;
  * the relational form exploded to (doc, pos) rows and needed a
  * per-document window plus a reassembly aggregate. This kernel is one
  * pass over the UTF-8 bytes per row — no explode, no window, no
  * shuffle — so the whole chunking stage becomes embarrassingly
  * narrow, and the relational [[graft.operators.Dedup.cdcChunks]] is
  * now a posexplode of this column.
  *
  * Token semantics replicate Spark's `split(text, " ")` exactly:
  * boundaries at every 0x20 byte (a space byte never occurs inside a
  * multi-byte UTF-8 sequence), empty tokens kept, "" = one empty
  * token. Gram hashes fold a code point 32 between tokens — identical
  * to hashing the space-joined string. NULL text yields NULL.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Long, mod: Long)
    extends UnaryExpression {
  require(w >= 1 && divisor >= 2, s"need w >= 1, divisor >= 2; got $w, $divisor")

  override def dataType: DataType = CdcChunks.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String].getBytes, w, divisor, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.CdcChunks.compute($s.getBytes(), " +
        s"$w, ${divisor}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_hash", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))), containsNull = false)

  /** One pass: token ranges (split on 0x20), rolling w-gram boundary
    * test, chunk hash per emitted chunk. Static so generated and
    * interpreted paths share one implementation.
    */
  def compute(b: Array[Byte], w: Int, divisor: Long, mod: Long): GenericArrayData = {
    // token byte ranges, Spark split-semantics (empty tokens kept)
    val starts = ArrayBuffer.empty[Int]
    val ends = ArrayBuffer.empty[Int]
    var i = 0
    var s = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        starts += s; ends += i; s = i + 1
      }
      i += 1
    }
    val n = starts.length
    // poly-hash of tokens [from, to] joined by single spaces
    def spanHash(from: Int, to: Int): Long = {
      var acc = 0L
      var j = from
      while (j <= to) {
        if (j > from) acc = (acc * 31L + 32L) % mod // the joining space
        acc = PolyHash.hashUtf8Bytes(b, starts(j), ends(j), acc, mod)
        j += 1
      }
      acc
    }
    val out = ArrayBuffer.empty[Any]
    var chunkFrom = 0
    var p = 0
    while (p < n) {
      if (p + 1 >= w && spanHash(p - w + 1, p) % divisor == 0L) {
        out += new GenericInternalRow(Array[Any](
          spanHash(chunkFrom, p), (p - chunkFrom + 1).toLong))
        chunkFrom = p + 1
      }
      p += 1
    }
    if (chunkFrom < n)
      out += new GenericInternalRow(Array[Any](
        spanHash(chunkFrom, n - 1), (n - chunkFrom).toLong))
    new GenericArrayData(out.toArray)
  }
}
