package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Min integer L2 distance to a broadcast center list — the distance
  * twin of [[NearestCellFixed]] (same input contract, same padding and
  * overflow rules): returns min over centers of Σ(aᵢ-bᵢ)², or
  * Long.MaxValue for an empty list. Built for greedy k-center selection
  * ([[graft.operators.Clustering.kCenterSelect]]), where each round
  * needs the distance itself (the farthest-point argmax), not the
  * nearest center's identity.
  */
case class MinCellDistFixed(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val centOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.fields.length == 2 =>
        s.fields(0).dataType == LongType &&
          (s.fields(1).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && centOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "min_cell_dist_fixed expects (array<bigint>, array<struct<bigint, array<bigint>>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any, cents: Any): Any =
    MinCellDistFixed.compute(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.MinCellDistFixed.compute($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinCellDistFixed =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "min_cell_dist_fixed"
}

object MinCellDistFixed {
  /** Same loop and overflow bound as [[NearestCellFixed.compute]], but
    * tracking the distance. */
  def compute(vec: ArrayData, cents: ArrayData): Long = {
    val n = vec.numElements()
    var bestD = Long.MaxValue
    var ci = 0
    val nc = cents.numElements()
    while (ci < nc) {
      val row = cents.getStruct(ci, 2)
      val cv = row.getArray(1)
      val m = cv.numElements()
      val len = math.max(n, m)
      var d = 0L
      var i = 0
      while (i < len) {
        val a = if (i < n) vec.getLong(i) else 0L
        val b = if (i < m) cv.getLong(i) else 0L
        val diff = a - b
        d += diff * diff
        i += 1
      }
      if (d < bestD) bestD = d
      ci += 1
    }
    bestD
  }
}
