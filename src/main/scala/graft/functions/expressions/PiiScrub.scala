package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native PII redaction kernel: three sequential global-replace passes
  * (emails, dotted-quad IPs, dashed phone numbers) over the document's
  * UTF-8 bytes, each byte-exact with the corresponding regex pass
  *
  *   - `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`  -> `<EMAIL>`
  *   - `\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}`              -> `<IP>`
  *   - `\d{3}-\d{3}-\d{4}`                               -> `<PHONE>`
  *
  * applied in that order with leftmost-match / resume-after-replacement
  * semantics. For these patterns (greedy quantifiers over disjoint
  * delimiter classes, no alternation) backtracking leftmost-first (Java,
  * used by the PiiScrubSpec fuzz reference `regexp_replace`) and
  * leftmost-longest (RE2, used by the DuckDB oracle) pick identical
  * matches — the email match resolves to the rightmost domain dot
  * followed by >=2 ASCII letters, which both disciplines select.
  *
  * All character classes are ASCII, so scanning bytes is UTF-8-safe:
  * multi-byte sequences can never participate in a match. A pass that
  * finds no match returns its input array unchanged (zero-copy).
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scrub expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PiiScrub.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.PiiScrub.scrub($s)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)

  override def prettyName: String = "pii_scrub"
}

object PiiScrub {
  private val EMAIL = "<EMAIL>".getBytes("UTF-8")
  private val IP = "<IP>".getBytes("UTF-8")
  private val PHONE = "<PHONE>".getBytes("UTF-8")

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** Entry point (called from generated code). */
  def scrub(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = phonePass(ipPass(emailPass(in)))
    if (out eq in) s else UTF8String.fromBytes(out)
  }

  /** Email pass. A match contains exactly one '@', so candidates are
    * enumerated by '@' position (ascending '@' order == ascending match
    * start order: the local class excludes '@', so runs cannot cross a
    * previous candidate). The local part is the maximal local-char run
    * left of the '@' clamped at the previous match end (regex resumes
    * scanning there); the match end is the rightmost domain dot with
    * >=2 following letters, plus that maximal letter run.
    */
  private def emailPass(b: Array[Byte]): Array[Byte] = {
    var out: java.io.ByteArrayOutputStream = null
    var copyFrom = 0
    var scanPos = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == '@' && i > scanPos) {
        var ls = i
        while (ls > scanPos && isLocal(b(ls - 1))) ls -= 1
        if (ls < i) {
          var e = i + 1
          while (e < b.length && isDomain(b(e))) e += 1
          // rightmost dot with a non-empty domain prefix and >=2 letters after
          var d = e - 1
          var matchEnd = -1
          while (d > i + 1 && matchEnd < 0) {
            if (b(d) == '.') {
              var m = d + 1
              while (m < b.length && isAlpha(b(m))) m += 1
              if (m - (d + 1) >= 2) matchEnd = m
            }
            d -= 1
          }
          if (matchEnd > 0) {
            if (out == null) out = new java.io.ByteArrayOutputStream(b.length + 16)
            out.write(b, copyFrom, ls - copyFrom)
            out.write(EMAIL, 0, EMAIL.length)
            copyFrom = matchEnd
            scanPos = matchEnd
            i = matchEnd
          } else i += 1
        } else i += 1
      } else i += 1
    }
    finish(b, out, copyFrom)
  }

  /** Dotted-quad pass: four digit runs of 1..3 joined by '.', trying every
    * start position (no boundary assertion, exactly like the regex). The
    * final octet takes min(3, run) digits greedily.
    */
  private def ipPass(b: Array[Byte]): Array[Byte] = {
    var out: java.io.ByteArrayOutputStream = null
    var copyFrom = 0
    var i = 0
    while (i < b.length) {
      var matchEnd = -1
      if (isDigit(b(i))) {
        var p = i
        var ok = true
        var oct = 0
        while (oct < 3 && ok) {
          var r = 0
          while (p + r < b.length && isDigit(b(p + r))) r += 1
          if (r >= 1 && r <= 3 && p + r < b.length && b(p + r) == '.') p += r + 1
          else ok = false
          oct += 1
        }
        if (ok) {
          var r = 0
          while (p + r < b.length && isDigit(b(p + r)) && r < 3) r += 1
          if (r >= 1) matchEnd = p + r
        }
      }
      if (matchEnd > 0) {
        if (out == null) out = new java.io.ByteArrayOutputStream(b.length + 16)
        out.write(b, copyFrom, i - copyFrom)
        out.write(IP, 0, IP.length)
        copyFrom = matchEnd
        i = matchEnd
      } else i += 1
    }
    finish(b, out, copyFrom)
  }

  /** Dashed phone pass: `\d{3}-\d{3}-\d{4}` — fixed-shape, so a direct
    * positional check at every start replicates the regex exactly (a 4th
    * leading digit simply fails this start and the scan advances one).
    */
  private def phonePass(b: Array[Byte]): Array[Byte] = {
    var out: java.io.ByteArrayOutputStream = null
    var copyFrom = 0
    var i = 0
    while (i < b.length) {
      var matchEnd = -1
      if (i + 12 <= b.length &&
          isDigit(b(i)) && isDigit(b(i + 1)) && isDigit(b(i + 2)) &&
          b(i + 3) == '-' &&
          isDigit(b(i + 4)) && isDigit(b(i + 5)) && isDigit(b(i + 6)) &&
          b(i + 7) == '-' &&
          isDigit(b(i + 8)) && isDigit(b(i + 9)) && isDigit(b(i + 10)) &&
          isDigit(b(i + 11))) {
        matchEnd = i + 12
      }
      if (matchEnd > 0) {
        if (out == null) out = new java.io.ByteArrayOutputStream(b.length + 16)
        out.write(b, copyFrom, i - copyFrom)
        out.write(PHONE, 0, PHONE.length)
        copyFrom = matchEnd
        i = matchEnd
      } else i += 1
    }
    finish(b, out, copyFrom)
  }

  private def finish(b: Array[Byte], out: java.io.ByteArrayOutputStream,
      copyFrom: Int): Array[Byte] =
    if (out == null) b
    else {
      out.write(b, copyFrom, b.length - copyFrom)
      out.toByteArray
    }
}
