package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-script composition counters in one pass over the document's
  * UTF-8 bytes — the multilingual-corpus front-door signal (script-mix
  * gating for mT5/CC-style pipelines: a "French" page that is 40% CJK
  * code points is mislabeled or boilerplate; mixed-script tokens are a
  * spam/homoglyph tell). Counts CODE POINTS by class:
  *
  *   - `n_latin`    — ASCII letters + Latin-1/Extended (U+00C0–U+024F)
  *   - `n_cyrillic` — U+0400–U+04FF
  *   - `n_cjk`      — Han U+4E00–U+9FFF + kana U+3040–U+30FF +
  *     Hangul syllables U+AC00–U+D7AF
  *   - `n_digit`    — ASCII 0-9
  *   - `n_space`    — space/tab/newline/CR
  *   - `n_other`    — every other code point (punctuation, symbols,
  *     other scripts)
  *
  * The decoder walks UTF-8 sequence heads (continuation bytes are
  * skipped by length), so per-row cost is one byte scan with no
  * intermediate arrays; the interpreted reference (`TextFunctions
  * .scriptMixViaHof`) splits per character and classifies via
  * code-point HOFs — spec-pinned identical, and the DuckDB oracle
  * replays the same ranges over `unicode()`. Malformed bytes (an
  * invalid head) count as `n_other` and advance one byte — identical
  * on both paths because the oracle only sees valid strings.
  *
  * Output: struct of the six long counters.
  */
case class ScriptMix(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ScriptMix.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_mix expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ScriptMix.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.ScriptMix.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): ScriptMix =
    copy(child = newChild)

  override def prettyName: String = "script_mix"
}

object ScriptMix {

  val schema: StructType = StructType(Seq(
    StructField("n_latin", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false)))

  def classify(cp: Int): Int = {
    if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0xC0 && cp <= 0x24F)) 0
    else if (cp >= 0x400 && cp <= 0x4FF) 1
    else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
      (cp >= 0xAC00 && cp <= 0xD7AF)) 2
    else if (cp >= '0' && cp <= '9') 3
    else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') 4
    else 5
  }

  def compute(s: UTF8String): GenericInternalRow = {
    val bytes = s.getBytes
    val counts = new Array[Long](6)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      var cp = -1
      var len = 1
      if (b < 0x80) { cp = b }
      else if (b >= 0xC2 && b <= 0xDF && i + 1 < bytes.length) {
        cp = ((b & 0x1F) << 6) | (bytes(i + 1) & 0x3F); len = 2
      } else if (b >= 0xE0 && b <= 0xEF && i + 2 < bytes.length) {
        cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F)
        len = 3
      } else if (b >= 0xF0 && b <= 0xF4 && i + 3 < bytes.length) {
        cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
        len = 4
      }
      counts(if (cp < 0) 5 else classify(cp)) += 1L
      i += len
    }
    new GenericInternalRow(Array[Any](counts(0), counts(1), counts(2),
      counts(3), counts(4), counts(5)))
  }
}
