package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed-feature linear quality score (the q140 fastText-style
  * classifier): one byte-scan per document — split on single spaces,
  * poly-hash each token span in place (the [[PolyHash]] range fold, no
  * token strings materialized), bucket, mix into the stand-in weight,
  * and sum:
  *
  *   Σ_tok ((polyHash(tok) % buckets) · 2654435761 % 1000 − 500)
  *
  * Bit-identical to the HOF formulation `aggregate(split(text, ' '),
  * 0L, (acc, t) -> acc + (poly_hash(t) % buckets) * 2654435761 % 1000
  * - 500)` (pinned by TextFunctionsSpec) including the empty-token
  * edges: split(" ") keeps leading/trailing/consecutive empty tokens,
  * each contributing the empty-hash weight −500 — the byte-scan
  * reproduces them as zero-length spans. The HOF form pays an
  * interpreted lambda (plus the per-token hash inside it) per token —
  * Catalyst HOFs are CodegenFallback — which is why every scorer
  * consumer (q140/q176/q177/q180/q147/q187) taxed ~1 s per million
  * tokens before this kernel.
  */
case class HashedFeatureScore(child: Expression, buckets: Int, mod: Long)
    extends UnaryExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_feature_score expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    HashedFeatureScore.score(input.asInstanceOf[UTF8String], buckets, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.HashedFeatureScore.score($s, $buckets, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): HashedFeatureScore =
    copy(child = newChild)

  override def prettyName: String = "hashed_feature_score"
}

object HashedFeatureScore {
  /** One pass over the UTF-8 bytes; static so generated and interpreted
    * paths share one implementation.
    */
  def score(s: UTF8String, buckets: Int, mod: Long): Long = {
    val b = s.getBytes
    var total = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' '.toByte) {
        val h = PolyHash.hashUtf8Bytes(b, start, i, 0L, mod)
        total += (h % buckets) * 2654435761L % 1000L - 500L
        start = i + 1
      }
      i += 1
    }
    total
  }
}
