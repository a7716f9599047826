package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a learned BPE merge list to a word
  * — the ENCODE step of [[graft.operators.Bpe]], fused into one pass.
  *
  * Semantically identical to the HOF formulation
  * ([[graft.operators.Bpe.tokenize]]: one interpreted `aggregate` fold
  * per merge, each re-materializing the accumulator string per symbol),
  * which stays as the spec-pinned parity reference. This kernel splits
  * the word into symbols once and applies every merge in rank order as
  * an in-place array fold — no per-symbol string rebuilding, no
  * interpreted lambda dispatch. The merge model rides as a codegen
  * reference object (it is tiny — the learned vocabulary).
  *
  * Output: the word's final symbols, space-joined (symbols never
  * contain spaces — they come from whitespace-split words).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${child.dataType.catalogString}")

  @transient private lazy val model: Array[Array[String]] =
    BpeEncode.toModel(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model, "java.lang.String[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.BpeEncode.encode($s, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  def toModel(merges: Seq[(String, String)]): Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r) }.toArray

  /** Parse a "lhs rhs,lhs rhs,…" model string (the SQL-registration
    * form — merges in rank order, pair parts space-separated).
    */
  def parseModel(s: String): Seq[(String, String)] =
    s.split(",").toSeq.filter(_.nonEmpty).map { m =>
      val Array(l, r) = m.split(" ", 2)
      (l, r)
    }

  /** The identical left-fold semantics as the HOF chain: for each merge
    * in rank order, scan the symbols once; fuse when the previous kept
    * symbol equals lhs and the current equals rhs (the fused symbol
    * never immediately re-merges).
    */
  def encode(word: UTF8String, model: Array[Array[String]]): UTF8String = {
    val w = word.toString
    // split into initial symbols by code point (test surface is ASCII;
    // pinned against the HOF chain by BpeExpressionSpec)
    var n = 0
    val syms = new Array[String](w.codePointCount(0, w.length))
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      ci += Character.charCount(cp)
    }
    var m = 0
    while (m < model.length) {
      val lhs = model(m)(0)
      val rhs = model(m)(1)
      var out = 0 // write index; fold in place (out <= read index)
      var i = 0
      while (i < n) {
        val x = syms(i)
        if (out > 0 && syms(out - 1) == lhs && x == rhs) syms(out - 1) = lhs + rhs
        else { syms(out) = x; out += 1 }
        i += 1
      }
      n = out
      m += 1
    }
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(syms(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
