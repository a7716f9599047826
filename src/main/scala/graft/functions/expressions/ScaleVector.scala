package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fixed-point vector scaling: `floor(x·scale + 0.5)` per
  * element, array<float|double> → array<long> — the quantization step
  * every fixed-point embedding operator runs FIRST (k-means assignment,
  * SemDeDup, semantic decontamination, prototype pruning, isotropy).
  *
  * Bit-identical to the HOF formulation `transform(v, x ->
  * floor(x·scale + 0.5))` (kept as
  * [[graft.operators.Clustering.scaleVectorViaHof]], parity-pinned by
  * VectorExpressionSpec), but one primitive loop per row inside
  * whole-stage codegen — Catalyst HOFs are CodegenFallback, so the
  * lambda was interpreted per ELEMENT on the hottest narrow pass of the
  * whole embedding family (the round-5 native-kernel rule, third
  * instance). Null elements stay null, like transform.
  */
case class ScaleVector(child: Expression, scale: Long) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  // 0 = float, 1 = double, 2 = long, 3 = int — all go through the same
  // cast-to-double arithmetic the HOF reference used (so a long beyond
  // 2^53 rounds identically in both formulations)
  private lazy val elemKind: Int = child.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(LongType, _) => 2
    case _ => 3
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
         ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"scale_vector expects array<float|double|long|int>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ScaleVector.compute(input.asInstanceOf[ArrayData], scale, elemKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.ScaleVector.compute($v, ${scale}L, $elemKind)")

  override protected def withNewChildInternal(newChild: Expression): ScaleVector =
    copy(child = newChild)

  override def prettyName: String = "scale_vector"
}

object ScaleVector {
  /** Identical double arithmetic to the HOF reference: x·scale + 0.5
    * in double, floor, narrow to long. Static so generated and
    * interpreted paths share one implementation.
    */
  def compute(arr: ArrayData, scale: Long, elemKind: Int): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out(i) = null
      else {
        val x = elemKind match {
          case 0 => arr.getFloat(i).toDouble
          case 1 => arr.getDouble(i)
          case 2 => arr.getLong(i).toDouble
          case _ => arr.getInt(i).toDouble
        }
        out(i) = math.floor(x * scale + 0.5).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
