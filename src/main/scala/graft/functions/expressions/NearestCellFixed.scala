package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fixed-point centroid argmin for the k-means assignment
  * ([[graft.operators.Clustering]]): given a scaled-long vector and a
  * broadcast centroid list `array<struct<cell: long, cv: array<long>>>`,
  * returns the cell with the smallest integer L2 distance, ties broken
  * to the LOWEST cell id — (dist, cell) lexicographic, so the result is
  * independent of the centroid list's order (collect_list order is not
  * deterministic) and matches the DuckDB oracle's
  * `row_number() OVER (ORDER BY dist, cell)` exactly.
  *
  * Differs from [[NearestCentroid]] (IVF encode) on both axes that
  * matter here: all-long arithmetic (no float rounding anywhere) and
  * order-independent tie-breaks. One codegen'd call per row replaces
  * the interpreted nested-HOF fold, which is kept in Clustering as the
  * parity reference. Missing trailing elements on either side are
  * treated as 0 (the zip_with-with-padding convention, documented).
  */
case class NearestCellFixed(left: Expression, right: Expression)
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
        "nearest_cell_fixed expects (array<bigint>, array<struct<bigint, array<bigint>>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(v: Any, cents: Any): Any =
    NearestCellFixed.compute(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.NearestCellFixed.compute($v, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellFixed =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_cell_fixed"
}

object NearestCellFixed {
  /** Integer L2 argmin with (dist, cell) lexicographic tie-breaks.
    * Returns Long.MaxValue for an empty centroid list — the HOF fold's
    * initial accumulator (`bc` in `Clustering.bestCellViaHof`), so the
    * native kernel and the parity reference agree on the edge case too
    * (spec-pinned in VectorExpressionSpec).
    *
    * Overflow bound: distances accumulate in a long, so the caller must
    * keep Σᵢ(aᵢ-bᵢ)² < 2⁶³ — i.e. per-dimension |a-b| below
    * √(2⁶³/dim) ≈ 3.0×10⁹/√dim. At the house scale=1000 that admits
    * |x| up to ~10⁵ even at dim=1000, far beyond the unit-norm
    * embedding contract; callers scaling raw magnitudes toward 2³¹ per
    * element would overflow and must reduce `scale`.
    */
  def compute(vec: ArrayData, cents: ArrayData): Long = {
    val n = vec.numElements()
    var bestD = Long.MaxValue
    var bestCell = Long.MaxValue
    var ci = 0
    val nc = cents.numElements()
    while (ci < nc) {
      val row = cents.getStruct(ci, 2)
      val cell = row.getLong(0)
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
      // Mirror the HOF fold exactly: better = d < bd || (d == bd && cell < bc).
      if (d < bestD || (d == bestD && cell < bestCell)) {
        bestD = d
        bestCell = cell
      }
      ci += 1
    }
    bestCell
  }
}
