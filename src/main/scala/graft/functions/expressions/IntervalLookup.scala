package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Broadcast interval-lookup join kernel: given a row value and a
  * SORTED, NON-OVERLAPPING interval table ([lo_i, hi_i) in fixed-point
  * longs, validated by the operator), returns the matching interval's
  * index via binary search, or -1.
  *
  * This is the IP-geolocation / price-bracket / time-zone enrichment
  * shape: a fact stream probed against a million-interval dimension.
  * The naive plan is a broadcast nested-loop theta join — O(m) interval
  * tests per row, 10¹² rows × 10⁶ intervals never finishes; this kernel
  * is O(log m) per row inside whole-stage codegen with the bounds held
  * once per executor (plan reference objects, shipped like a bloom
  * filter's bits, not per-row).
  */
case class IntervalLookup(child: Expression, los: Array[Long], his: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interval_lookup expects a bigint value, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    IntervalLookup.search(input.asInstanceOf[Long], los, his)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("los", los, "long[]")
    val hisRef = ctx.addReferenceObj("his", his, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.IntervalLookup.search($v, $losRef, $hisRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalLookup =
    copy(child = newChild)

  override def prettyName: String = "interval_lookup"
}

object IntervalLookup {
  /** Largest i with lo_i <= v, then verify v < hi_i; -1 when none. */
  def search(v: Long, los: Array[Long], his: Array[Long]): Int = {
    var lo = 0
    var hi = los.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= v) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0 && v < his(ans)) ans else -1
  }
}
