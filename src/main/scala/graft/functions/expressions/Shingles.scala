package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-shingle construction over a token array: one UTF8String
  * concat per window, all inside whole-stage codegen.
  *
  * Bit-identical to the HOF formulation
  * `transform(sequence(1, n-k+1), i -> concat_ws(' ', l[i], …,
  * l[i+k-1]))` (kept as
  * [[graft.functions.TextFunctions.shinglesOfTokensViaHof]] and pinned
  * by OperatorsSpec) — but the HOF lambda is INTERPRETED per shingle
  * (Catalyst higher-order functions are CodegenFallback), which taxed
  * every shingle consumer in the engine: the q141 rewrite away from it
  * measured 3.4x on the whole query. Null tokens are skipped exactly
  * like concat_ws (no separator); split() never produces them, but
  * library callers' arrays might.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Shingles.build(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.Shingles.build($v, $k)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object Shingles {
  private val Sep = UTF8String.fromString(" ")

  /** Windowed concat_ws over the token array — static so generated and
    * interpreted paths share one implementation.
    */
  def build(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - k + 1)
    val win = new Array[UTF8String](k)
    var s = 0
    while (s <= n - k) {
      var j = 0
      while (j < k) { win(j) = toks(s + j); j += 1 }
      out(s) = UTF8String.concatWs(Sep, win: _*)
      s += 1
    }
    new GenericArrayData(out)
  }
}
