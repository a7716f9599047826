package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native JL sign projection: out_j = Σ_i floor(x_i·scale + 0.5) · S_ji
  * for the deterministic ±1 matrix of
  * [[graft.operators.Projection.signMatrix]] (Achlioptas 2001).
  *
  * Bit-identical to the HOF formulation (transform over a literal
  * matrix of zip_with/aggregate folds — kept as
  * [[graft.operators.Projection.signProjectViaHof]] and pinned by
  * ProjectionSpec) but ONE tight primitive loop per row: the HOF form
  * pays an interpreted lambda call per (j, i) cell — dOut·dim ≈ 1 000
  * evals/row, measured ~1.3 s for 5 000 rows at sf0.1 where this
  * kernel is in the per-row microseconds. The matrix is built once per
  * (dOut, dim, seed) and cached process-wide (a few KB of longs — the
  * same class as a codegen'd literal, never per-row work).
  */
case class SignProject(child: Expression, dOut: Int, dim: Int,
                       seed: Long, scale: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_project expects array<float|double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignProject.project(input.asInstanceOf[ArrayData], isFloat, dOut, dim,
      seed, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.SignProject.project($v, $isFloat, " +
        s"$dOut, $dim, ${seed}L, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): SignProject =
    copy(child = newChild)

  override def prettyName: String = "sign_project"
}

object SignProject {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Long]]()

  /** Flat row-major ±1 matrix, cached per (dOut, dim, seed); delegates
    * the sign formula to [[graft.operators.Projection.signOf]] — ONE
    * source of truth shared with the driver-built literal matrix and
    * the oracle SQL fragment.
    */
  def signs(dOut: Int, dim: Int, seed: Long): Array[Long] =
    cache.computeIfAbsent((dOut, dim, seed), { _ =>
      val m = new Array[Long](dOut * dim)
      var c = 0
      while (c < m.length) {
        m(c) = graft.operators.Projection.signOf(c.toLong + seed)
        c += 1
      }
      m
    })

  /** Scale once into a local long buffer, then dOut dot products. */
  def project(arr: ArrayData, isFloat: Boolean, dOut: Int, dim: Int,
              seed: Long, scale: Long): GenericArrayData = {
    val s = signs(dOut, dim, seed)
    val n = math.min(arr.numElements(), dim)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = math.floor(x * scale + 0.5).toLong
      i += 1
    }
    val out = new Array[Any](dOut)
    var j = 0
    while (j < dOut) {
      var acc = 0L
      val off = j * dim
      i = 0
      while (i < n) {
        acc += q(i) * s(off + i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
