package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the four Gopher-style (Rae et al. 2021,
  * arXiv:2112.11446 §A1.1) document-quality counters fused into one pass
  * over the document's UTF-8 bytes:
  *
  *   - `n_words`  — token count under Spark `split(text, " ", -1)`
  *     semantics (spans between 0x20 bytes; empty tokens, including
  *     leading/trailing ones, are ordinary tokens — a 0x20 byte never
  *     occurs inside a multi-byte UTF-8 sequence, so byte-level spans
  *     equal character-level splits);
  *   - `char_sum` — total word characters, `numChars - (n_words - 1)`
  *     (the single-space-joined identity the HOF form uses);
  *   - `n_stop`   — tokens equal to one of the stopwords;
  *   - `n_types`  — DISTINCT tokens (`array_distinct` cardinality),
  *     counted via open addressing over token hashes with byte-exact
  *     span comparison on probe, so hash collisions cannot inflate or
  *     deflate the count.
  *
  * Semantically identical to the `split` + `filter` + `array_distinct`
  * higher-order-function chain that the DuckDB oracle replays — but the
  * HOF chain is interpreted per element and materializes two arrays per
  * row, while this kernel walks byte spans in place and allocates only
  * three int arrays sized to the token count. Mean word length and
  * type-token ratio stay single int/int double divisions at the call
  * site, so oracle parity is bit-for-bit.
  */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = GopherStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${child.dataType.catalogString}")

  @transient private lazy val stopBytes = CleanTokens.toBytes(stopwords)

  override def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.GopherStats.compute($s, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)

  override def prettyName: String = "gopher_stats"
}

object GopherStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false)))

  private def spanEqualsBytes(b: Array[Byte], s: Int, e: Int,
                              w: Array[Byte]): Boolean = {
    if (e - s != w.length) return false
    var i = 0
    while (i < w.length) {
      if (b(s + i) != w(i)) return false
      i += 1
    }
    true
  }

  private def spansEqual(b: Array[Byte], s1: Int, e1: Int,
                         s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = 0
    while (i < e1 - s1) {
      if (b(s1 + i) != b(s2 + i)) return false
      i += 1
    }
    true
  }

  def compute(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val b = s.getBytes
    // pass 1: count spans (= 0x20 count + 1, split limit -1 semantics)
    var nWords = 1
    var i = 0
    while (i < b.length) {
      if (b(i) == 0x20) nWords += 1
      i += 1
    }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    // pass 2: span bounds, stopword hits, span hashes
    val cap = Integer.highestOneBit(math.max(4, nWords * 2) - 1) << 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    var nStop = 0L
    var nTypes = 0L
    var w = 0
    var start = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        starts(w) = start
        ends(w) = i
        var j = 0
        var stopped = false
        while (j < stops.length && !stopped) {
          if (spanEqualsBytes(b, start, i, stops(j))) { nStop += 1; stopped = true }
          j += 1
        }
        // FNV-1a over the span bytes for the distinct table
        var h = 0x811c9dc5
        var k = start
        while (k < i) { h = (h ^ (b(k) & 0xff)) * 0x01000193; k += 1 }
        var slot = h & (cap - 1)
        var fresh = true
        var probing = true
        while (probing) {
          val occ = table(slot)
          if (occ == -1) { table(slot) = w; probing = false }
          else if (spansEqual(b, starts(occ), ends(occ), start, i)) {
            fresh = false; probing = false
          } else slot = (slot + 1) & (cap - 1)
        }
        if (fresh) nTypes += 1
        w += 1
        start = i + 1
      }
      i += 1
    }
    val charSum = s.numChars().toLong - (nWords - 1).toLong
    new GenericInternalRow(Array[Any](nWords.toLong, charSum, nStop, nTypes))
  }
}
