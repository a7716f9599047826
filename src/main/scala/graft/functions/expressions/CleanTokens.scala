package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the q112 cleaning pipeline (stopword
  * removal + consecutive-duplicate-token collapse) fused into one pass
  * over the document's UTF-8 bytes.
  *
  * Semantically identical to the higher-order-function formulation
  * (`filter(toks, not isin stopwords)` then the indexed filter against the
  * previous element, then `array_join`), which the DuckDB oracle replays —
  * but the HOF chain is interpreted per element and materializes two
  * intermediate arrays per row, while this kernel walks token byte spans
  * in place (split-on-0x20, Spark split limit -1 semantics: empty tokens,
  * including trailing ones, are ordinary tokens) and copies surviving
  * spans straight into the output buffer. No per-token allocation.
  */
case class CleanTokens(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_tokens expects string, got ${child.dataType.catalogString}")

  @transient private lazy val stopBytes = CleanTokens.toBytes(stopwords)

  override def nullSafeEval(input: Any): Any =
    CleanTokens.clean(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.CleanTokens.clean($s, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CleanTokens =
    copy(child = newChild)

  override def prettyName: String = "clean_tokens"
}

/** Companion count: number of tokens the cleaned text contains — returned
  * as its own scalar because the count is NOT recoverable from the cleaned
  * string (an all-stopword document cleans to "", which `split` would
  * re-tokenize as one empty token, not zero).
  */
case class CleanTokensCount(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_tokens_count expects string, got ${child.dataType.catalogString}")

  @transient private lazy val stopBytes = CleanTokens.toBytes(stopwords)

  override def nullSafeEval(input: Any): Any =
    CleanTokens.count(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.CleanTokens.count($s, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CleanTokensCount =
    copy(child = newChild)

  override def prettyName: String = "clean_tokens_count"
}

object CleanTokens {

  def toBytes(stopwords: Seq[String]): Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

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

  private def isStop(b: Array[Byte], s: Int, e: Int,
                     stops: Array[Array[Byte]]): Boolean = {
    var i = 0
    while (i < stops.length) {
      if (spanEqualsBytes(b, s, e, stops(i))) return true
      i += 1
    }
    false
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

  def clean(s: UTF8String, stops: Array[Array[Byte]]): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var pos = 0
    var kept = 0
    var lastS = -1
    var lastE = -1
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (!isStop(b, start, i, stops) &&
          (lastS < 0 || !spansEqual(b, start, i, lastS, lastE))) {
          if (kept > 0) { out(pos) = 0x20; pos += 1 }
          System.arraycopy(b, start, out, pos, i - start)
          pos += i - start
          kept += 1
          lastS = start; lastE = i
        }
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, pos)
  }

  def count(s: UTF8String, stops: Array[Array[Byte]]): Int = {
    val b = s.getBytes
    var kept = 0
    var lastS = -1
    var lastE = -1
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (!isStop(b, start, i, stops) &&
          (lastS < 0 || !spansEqual(b, start, i, lastS, lastE))) {
          kept += 1
          lastS = start; lastE = i
        }
        start = i + 1
      }
      i += 1
    }
    kept
  }
}
