package graft

import graft.functions.expressions.{CosineSimilarity, L2DistanceSq, MinHashSignature, PolyHash, SimHash}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions. Activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`); for an already-running
  * session use [[graft.FunctionRegistrar]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("l2_distance_sq"),
      new ExpressionInfo(classOf[L2DistanceSq].getName, "l2_distance_sq"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "l2_distance_sq(a, b) takes 2 arguments")
        L2DistanceSq(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => PolyHash(s, Dedup.M)
        case Seq(s, Literal(m: Long, _)) => PolyHash(s, m)
        // SQL users write plain int literals (`poly_hash(s, 1000003)`
        // parses as IntegerType) — widen rather than reject.
        case Seq(s, Literal(m: Int, _)) => PolyHash(s, m.toLong)
        case _ => throw new IllegalArgumentException(
          "poly_hash(str[, mod]) takes a string and an optional integer literal modulus")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) =>
        GraftExtensions.withIntArgs("minhash_signature", children, 8, 3)(MinHashSignature.apply)))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (children: Seq[Expression]) =>
        GraftExtensions.withIntArgs("simhash", children, 16, 3)(SimHash.apply)))
    ext.injectFunction((
      FunctionIdentifier("nearest_cell_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.NearestCellFixed].getName,
        "nearest_cell_fixed"),
      (children: Seq[Expression]) => children match {
        case Seq(v, c) => graft.functions.expressions.NearestCellFixed(v, c)
        case _ => throw new IllegalArgumentException(
          "nearest_cell_fixed(vec, cents) takes a long-array vector and a " +
            "array<struct<cell, cv>> centroid list")
      }))
    ext.injectFunction((
      FunctionIdentifier("clean_tokens"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.CleanTokens].getName, "clean_tokens"),
      (children: Seq[Expression]) => children match {
        case Seq(s, arr) =>
          graft.functions.expressions.CleanTokens(
            s, GraftExtensions.stringArrayArg("clean_tokens", arr))
        case _ => throw new IllegalArgumentException(
          "clean_tokens(str, array(stopword, ...)) takes a string column and a literal string array")
      }))
    ext.injectFunction((
      FunctionIdentifier("clean_tokens_count"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.CleanTokensCount].getName,
        "clean_tokens_count"),
      (children: Seq[Expression]) => children match {
        case Seq(s, arr) =>
          graft.functions.expressions.CleanTokensCount(
            s, GraftExtensions.stringArrayArg("clean_tokens_count", arr))
        case _ => throw new IllegalArgumentException(
          "clean_tokens_count(str, array(stopword, ...)) takes a string column and a literal string array")
      }))
    ext.injectFunction((
      FunctionIdentifier("pii_scrub"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.PiiScrub].getName, "pii_scrub"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => graft.functions.expressions.PiiScrub(s)
        case _ => throw new IllegalArgumentException(
          "pii_scrub(str) takes one string column")
      }))
    // Aggregates: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression itself (same path as built-in percentile).
    ext.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.BoundedTopKAgg].getName, "topk_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(v, id, Literal(k: Int, _)) =>
          graft.functions.expressions.BoundedTopKAgg(v, id, k)
        case _ => throw new IllegalArgumentException(
          "topk_agg(value, id, k) takes two columns and an int literal k")
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.MisraGriesAgg].getName, "misra_gries"),
      (children: Seq[Expression]) => children match {
        case Seq(v, Literal(k: Int, _)) =>
          graft.functions.expressions.MisraGriesAgg(v, k)
        case _ => throw new IllegalArgumentException(
          "misra_gries(item, k) takes a string column and an int literal k")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.BloomBuildAgg].getName, "bloom_build"),
      (children: Seq[Expression]) => children match {
        case Seq(v, Literal(logBits: Int, _), Literal(k: Int, _)) =>
          graft.functions.expressions.BloomBuildAgg(v, logBits, k)
        case _ => throw new IllegalArgumentException(
          "bloom_build(id, logBits, numHashes) takes a bigint column and two int literals")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.BloomMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(b, v, Literal(k: Int, _)) =>
          graft.functions.expressions.BloomMightContain(b, v, k)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain(blob, id, numHashes) takes a binary column, a bigint column, and an int literal")
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => children match {
        case Seq(w, Literal(m: org.apache.spark.unsafe.types.UTF8String, _)) =>
          graft.functions.expressions.BpeEncode(w,
            graft.functions.expressions.BpeEncode.parseModel(m.toString))
        case _ => throw new IllegalArgumentException(
          "bpe_encode(word, model) takes a string column and a " +
            "'lhs rhs,lhs rhs,…' model literal")
      }))
    ext.injectFunction((
      FunctionIdentifier("fixed_point_vector_sum"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.FixedPointVectorSum].getName,
        "fixed_point_vector_sum"),
      (children: Seq[Expression]) => children match {
        case Seq(v, Literal(s: Long, _)) =>
          graft.functions.expressions.FixedPointVectorSum(v, s)
        case Seq(v, Literal(s: Int, _)) =>
          graft.functions.expressions.FixedPointVectorSum(v, s.toLong)
        case _ => throw new IllegalArgumentException(
          "fixed_point_vector_sum(vec, scale) takes a vector column and an integer literal scale")
      }))
    ext.injectFunction((
      FunctionIdentifier("levenshtein_within"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.LevenshteinWithin].getName,
        "levenshtein_within"),
      (children: Seq[Expression]) => children match {
        case Seq(l, r, Literal(tau: Int, _)) =>
          graft.functions.expressions.LevenshteinWithin(l, r, tau)
        case _ => throw new IllegalArgumentException(
          "levenshtein_within(l, r, tau) takes two strings and an int literal tau")
      }))
    ext.injectFunction((
      FunctionIdentifier("deletion_variants"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.DeletionVariants].getName,
        "deletion_variants"),
      (children: Seq[Expression]) => children match {
        case Seq(s, Literal(tau: Int, _)) =>
          graft.functions.expressions.DeletionVariants(s, tau)
        case _ => throw new IllegalArgumentException(
          "deletion_variants(s, tau) takes a string and an int literal tau in {1, 2}")
      }))
  }
}

object GraftExtensions {
  /** Evaluates a foldable array<string> argument (SQL `array('a', 'b')`
    * parses as CreateArray, not Literal, so match on foldability).
    */
  def stringArrayArg(name: String, e: Expression): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val isStringArray = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    require(e.foldable && isStringArray,
      s"$name expects a literal array<string>, got ${e.dataType.catalogString}")
    val data = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    data.toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(s => if (s == null) null else s.toString).toSeq
  }

  /** Builder for `fn(str[, n[, k]])` signatures with int-literal options. */
  def withIntArgs(name: String, children: Seq[Expression],
      defaultN: Int, defaultK: Int)(
      build: (Expression, Int, Int) => Expression): Expression = children match {
    case Seq(s) => build(s, defaultN, defaultK)
    case Seq(s, Literal(n: Int, _)) => build(s, n, defaultK)
    case Seq(s, Literal(n: Int, _), Literal(k: Int, _)) => build(s, n, k)
    case _ => throw new IllegalArgumentException(
      s"$name(str[, n[, k]]) takes a string and optional int literals")
  }
}
