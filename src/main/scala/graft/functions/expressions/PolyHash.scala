package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: base-31 polynomial hash of a string's Unicode
  * code points, `acc = (acc * 31 + codePoint) % mod`, left to right.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(split(s, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % mod)`
  * and to DuckDB's `list_reduce(list_prepend(0, list_transform(
  * string_split(s, ''), x -> unicode(x))), (acc, c) -> (acc * 31 + c) % mod)`
  * — the cross-engine hash the dedup oracle queries rely on — but decodes
  * UTF-8 in place: no per-character string array, no HOF lambda dispatch,
  * and full whole-stage codegen. On shingle-heavy dedup pipelines the HOF
  * form allocates tens of single-char UTF8Strings per shingle; this is a
  * single tight loop over the bytes.
  */
case class PolyHash(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    PolyHash.hashUtf8Bytes(bytes, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.PolyHash.hashUtf8Bytes($s.getBytes(), ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}

object PolyHash {
  /** Decode UTF-8 code points and fold. Static so generated code and the
    * interpreted path share one implementation (same pattern Spark's own
    * string expressions use for their runtime helpers).
    */
  def hashUtf8Bytes(b: Array[Byte], mod: Long): Long =
    hashUtf8Bytes(b, 0, b.length, 0L, mod)

  /** Range + seed variant: fold code points of b[from, until) onto `seed` —
    * lets callers hash a multi-token span (e.g. a shingle with separator
    * folds between tokens) without materializing the concatenated string.
    */
  def hashUtf8Bytes(b: Array[Byte], from: Int, until: Int, seed: Long, mod: Long): Long = {
    var acc = seed
    var i = from
    val n = until
    while (i < n) {
      val b0 = b(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); len = 2 }
      else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        len = 4
      }
      acc = (acc * 31L + cp) % mod
      i += len
    }
    acc
  }
}
