package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native FastSS deletion neighborhood: all distinct strings obtainable
  * by deleting at most `tau` (1 or 2) Unicode code points, the string
  * itself included. Semantically identical to the HOF formulation in
  * [[graft.operators.EditDistance]]'s scaladoc (kept there as the
  * documented reference; EditDistanceSpec pins parity), but one pass
  * over the UTF-8 bytes per variant with no lambda dispatch: deleting a
  * code point is two byte-range copies, so a variant costs one small
  * byte-array allocation. Dedup via a HashSet of UTF8String (equality
  * is byte equality — exactly array_distinct's semantics on strings).
  */
case class DeletionVariants(child: Expression, tau: Int)
    extends UnaryExpression {
  require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_variants expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    DeletionVariants.variants(input.asInstanceOf[UTF8String], tau)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.DeletionVariants.variants($s, $tau)")

  override protected def withNewChildInternal(newChild: Expression): DeletionVariants =
    copy(child = newChild)

  override def prettyName: String = "deletion_variants"
}

object DeletionVariants {

  /** Byte offsets of each code-point start, plus the end offset. */
  private def cpOffsets(b: Array[Byte]): Array[Int] = {
    val out = new Array[Int](b.length + 1)
    var i = 0
    var n = 0
    while (i < b.length) {
      out(n) = i
      n += 1
      val b0 = b(i) & 0xff
      i += (if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4)
    }
    out(n) = b.length
    java.util.Arrays.copyOf(out, n + 1)
  }

  /** The string minus byte ranges [o(i), o(i+1)) and (for j >= 0)
    * [o(j), o(j+1)), as a fresh UTF8String.
    */
  private def drop(b: Array[Byte], o: Array[Int], i: Int, j: Int): UTF8String = {
    val cut2 = j >= 0
    val len = b.length - (o(i + 1) - o(i)) - (if (cut2) o(j + 1) - o(j) else 0)
    val out = new Array[Byte](len)
    var p = 0
    // [0, o(i))
    System.arraycopy(b, 0, out, p, o(i)); p += o(i)
    if (cut2) {
      System.arraycopy(b, o(i + 1), out, p, o(j) - o(i + 1)); p += o(j) - o(i + 1)
      System.arraycopy(b, o(j + 1), out, p, b.length - o(j + 1))
    } else {
      System.arraycopy(b, o(i + 1), out, p, b.length - o(i + 1))
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct <=tau-deletion variants (self included). Static so
    * generated and interpreted paths share one implementation.
    */
  def variants(s: UTF8String, tau: Int): ArrayData = {
    val b = s.getBytes
    val o = cpOffsets(b)
    val n = o.length - 1 // code-point count
    val seen = new java.util.LinkedHashSet[UTF8String]()
    seen.add(s.clone())
    var i = 0
    while (i < n) {
      seen.add(drop(b, o, i, -1))
      if (tau >= 2) {
        var j = i + 1
        while (j < n) {
          seen.add(drop(b, o, i, j))
          j += 1
        }
      }
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}
