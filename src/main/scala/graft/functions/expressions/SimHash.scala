package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's SimHash in one pass over its
  * UTF-8 bytes.
  *
  * Semantically identical to the aggregated pipeline (explode k-shingles →
  * content-hash tids → DISTINCT (doc, tid) → per-bit majority vote
  * `sum(2*((tid*a_j+b_j) mod P mod 2) - 1) > 0`), which the DuckDB oracle
  * replays — but with the distinct applied in-row: shingle hashes fold
  * directly from token byte spans ([[MinHashSignature]]'s trick), tids
  * dedupe through a small open-addressing set, and the nBits vote counters
  * update in place. Integer vote sums are order-independent, so the result
  * is bit-identical to the shuffled aggregation.
  *
  * Documents with fewer than k tokens have no shingles and yield null.
  */
case class SimHash(child: Expression, nBits: Int, k: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= MinHashSignature.AS.length,
    s"nBits must be in [1, ${MinHashSignature.AS.length}]")
  require(k >= 1, "shingle width k must be >= 1")

  override def dataType: DataType = LongType

  // < k tokens yields null regardless of child nullability.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String], nBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val tmp = ctx.freshName("sh")
      s"""
        Long $tmp = graft.functions.expressions.SimHash.compute($s, $nBits, $k);
        if ($tmp == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $tmp.longValue();
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHash {
  import MinHashSignature.{AS, BS, M, P}

  /** Returns null (boxed) when the document has fewer than k tokens. */
  def compute(s: UTF8String, nBits: Int, k: Int): java.lang.Long = {
    val b = s.getBytes
    var nSeg = 1
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) nSeg += 1; i += 1 }
    val starts = new Array[Int](nSeg)
    val ends = new Array[Int](nSeg)
    var seg = 0
    starts(0) = 0
    i = 0
    while (i < b.length) {
      if (b(i) == 0x20) { ends(seg) = i; seg += 1; starts(seg) = i + 1 }
      i += 1
    }
    ends(seg) = b.length
    // Spark split(limit -1) semantics: trailing empty tokens kept, matching
    // the aggregated path and the DuckDB oracle (see [[MinHashSignature]]).
    val n = nSeg
    if (n < k) return null

    // Open-addressing distinct-tid set (-1 = empty; tids are >= 0).
    var cap = Integer.highestOneBit(math.max(4, (n - k + 1) * 2) - 1) << 1
    var set = new Array[Long](cap)
    java.util.Arrays.fill(set, -1L)
    var size = 0
    val votes = new Array[Long](nBits)

    def insert(tid: Long): Boolean = { // true if newly added
      var idx = (tid ^ (tid >>> 16)).toInt & (cap - 1)
      while (set(idx) != -1L) {
        if (set(idx) == tid) return false
        idx = (idx + 1) & (cap - 1)
      }
      set(idx) = tid
      size += 1
      if (size * 4 > cap * 3) { // grow at 75%
        val old = set
        cap <<= 1
        set = new Array[Long](cap)
        java.util.Arrays.fill(set, -1L)
        var oi = 0
        while (oi < old.length) {
          val v = old(oi)
          if (v != -1L) {
            var idx2 = (v ^ (v >>> 16)).toInt & (cap - 1)
            while (set(idx2) != -1L) idx2 = (idx2 + 1) & (cap - 1)
            set(idx2) = v
          }
          oi += 1
        }
      }
      true
    }

    var w = 0
    while (w <= n - k) {
      var h = 0L
      var t = w
      while (t < w + k) {
        if (t > w) h = (h * 31L + 32L) % M
        h = PolyHash.hashUtf8Bytes(b, starts(t), ends(t), h, M)
        t += 1
      }
      if (insert(h)) {
        var j = 0
        while (j < nBits) {
          votes(j) += ((h * AS(j) + BS(j)) % P % 2L) * 2L - 1L
          j += 1
        }
      }
      w += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
}
