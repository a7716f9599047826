package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass URL kernels. Bit-identical to the built-in
  * composition in [[graft.functions.UrlFunctions]] (kept there as
  * `...ViaExprs` parity references, UrlKernelSpec pins equality) — but
  * ONE small expression node each.
  *
  * Why this matters: the Column-DSL composition duplicates subtrees at
  * CONSTRUCTION time — `registeredDomain` references the host nine
  * times (five suffix tests + three label cuts + fallback), the host
  * references the authority twice, the authority the scheme-stripped
  * URL twice — so a synthetic-URL input tree multiplies ~40x per use,
  * and a pipeline referencing the result a few layers deep (q147/q164)
  * reaches 100 KB+ plan trees whose ANALYSIS and codegen dominate the
  * query (q148 measured 9.4 s cold / 2.0 s warm for a 5 k-row heap
  * aggregate). SPARK-36718 only guards the optimizer's project
  * collapse, not trees the caller builds. A native kernel is both the
  * small tree and the single parse.
  */
object UrlKernels {

  private def indexOf(s: String, sub: String): Int = s.indexOf(sub)

  /** afterScheme + host + www-strip, shared by both kernels:
    * lower(split_part(split_part(after, "/", 1), ":", 1)) minus one
    * leading "www.". Returns (host, afterScheme).
    */
  private def hostOf(url: String): (String, String) = {
    val i = indexOf(url, "://")
    val after = if (i >= 0) url.substring(i + 3) else url
    val slash = after.indexOf('/')
    val auth = if (slash >= 0) after.substring(0, slash) else after
    val colon = auth.indexOf(':')
    val beforePort = if (colon >= 0) auth.substring(0, colon) else auth
    val low = UTF8String.fromString(beforePort).toLowerCase.toString
    val host = if (low.startsWith("www.")) low.substring(4) else low
    (host, after)
  }

  /** Last `n` dot-separated labels of `h` — substring_index(h, ".", -n)
    * semantics (whole string when there are fewer than n dots).
    */
  private def lastLabels(h: String, n: Int): String = {
    var cut = h.length
    var seen = 0
    var i = h.length - 1
    while (i >= 0 && seen < n) {
      if (h.charAt(i) == '.') { seen += 1; if (seen == n) cut = i + 1 }
      i -= 1
    }
    if (seen < n) h else h.substring(cut)
  }

  def registeredDomain(url: UTF8String, twoPart: Array[String]): UTF8String = {
    val (h, _) = hostOf(url.toString)
    var isTwo = false
    var i = 0
    while (i < twoPart.length && !isTwo) {
      if (h.endsWith("." + twoPart(i))) isTwo = true
      i += 1
    }
    val out =
      if (isTwo) lastLabels(h, 3)
      else if (h.indexOf('.') >= 0) lastLabels(h, 2)
      else h
    UTF8String.fromString(out)
  }

  def normalizeUrl(url: UTF8String): UTF8String = {
    val s = url.toString
    val i = indexOf(s, "://")
    val scheme =
      if (i >= 0) UTF8String.fromString(s.substring(0, i)).toLowerCase.toString
      else "https"
    val (host, after) = hostOf(s)
    val slash = after.indexOf('/')
    val rawPath = if (slash >= 0) after.substring(slash) else ""
    var p = rawPath
    val hash = p.indexOf('#')
    if (hash >= 0) p = p.substring(0, hash)
    val q = p.indexOf('?')
    if (q >= 0) p = p.substring(0, q)
    var end = p.length
    while (end > 0 && p.charAt(end - 1) == '/') end -= 1
    UTF8String.fromString(scheme + "://" + host + p.substring(0, end))
  }
}

/** eTLD+1 grouping key — see [[UrlKernels]]. */
case class RegisteredDomain(child: Expression, twoPartSuffixes: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"registered_domain expects string, got ${child.dataType.catalogString}")

  private val suffixArr: Array[String] = twoPartSuffixes.toArray

  override def nullSafeEval(input: Any): Any =
    UrlKernels.registeredDomain(input.asInstanceOf[UTF8String], suffixArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("suffixes", suffixArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, u =>
      s"graft.functions.expressions.UrlKernels.registeredDomain($u, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegisteredDomain =
    copy(child = newChild)

  override def prettyName: String = "registered_domain"
}

/** Canonical URL-dedup key — see [[UrlKernels]]. */
case class NormalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_url expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UrlKernels.normalizeUrl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u =>
      s"graft.functions.expressions.UrlKernels.normalizeUrl($u)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "normalize_url"
}
