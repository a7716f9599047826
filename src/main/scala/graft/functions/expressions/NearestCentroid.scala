package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** Native Catalyst expression: the cell id of the nearest centroid to a
  * vector — the IVF coarse-assignment kernel as one fused loop.
  *
  * `right` is the centroid table as an array<struct<cell: long,
  * cv: array<double>>> literal (centroids are nlist-sized by definition —
  * one reference, not per-row data). Distance is
  * `d = <c,c> - 2<v,c>` with both dot products computed as the same
  * sequential left-to-right double fold as [[CosineSimilarity]] and
  * DuckDB's `list_dot_product`, so the argmin — including exact-tie
  * behavior (strict `<` keeps the earliest = lowest cell id in a
  * cell-sorted array) — is bit-identical across engines.
  *
  * The higher-order-function formulation (`aggregate` over the centroid
  * array with `zip_with` dot products) computes the same thing but is
  * interpreted and allocates intermediate arrays per centroid per row;
  * this is a single codegen'd loop nest.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.fields.length == 2 =>
        s.fields(0).dataType == LongType &&
          (s.fields(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && centOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "nearest_centroid expects (array<float|double>, array<struct<long, array<double>>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cents: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.NearestCentroid.compute($v, $c, $vecIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def compute(vec: ArrayData, cents: ArrayData, vecIsFloat: Boolean): Long = {
    val n = vec.numElements()
    var bestCell = -1L
    var bestD = Double.MaxValue
    var ci = 0
    val nc = cents.numElements()
    while (ci < nc) {
      val row = cents.getStruct(ci, 2)
      val cv = row.getArray(1)
      val m = cv.numElements()
      // d = <c,c> - 2<v,c>, each dot a sequential fold (oracle parity).
      var dcc = 0.0
      var dvc = 0.0
      var i = 0
      while (i < m) {
        val c = cv.getDouble(i)
        val x = if (i < n) { if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i) } else 0.0
        dcc += c * c
        dvc += x * c
        i += 1
      }
      val d = dcc - 2.0 * dvc
      if (d < bestD) { bestD = d; bestCell = row.getLong(0) }
      ci += 1
    }
    bestCell
  }
}
