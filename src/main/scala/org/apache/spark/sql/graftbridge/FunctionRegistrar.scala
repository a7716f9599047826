package org.apache.spark.sql.graftbridge

import graft.functions.expressions.{CosineSimilarity, L2DistanceSq, MinHashSignature, PolyHash, SimHash}
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.SparkSession

/** Runtime registration of the engine's SQL functions on an existing
  * session (the extensions path, [[graft.GraftExtensions]], requires
  * configuring before session creation).
  */
object FunctionRegistrar {
  def registerAll(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => {
        require(exprs.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_distance_sq",
      exprs => {
        require(exprs.length == 2, "l2_distance_sq(a, b) takes 2 arguments")
        L2DistanceSq(exprs.head, exprs(1))
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash",
      {
        case Seq(s) => PolyHash(s, graft.operators.Dedup.M)
        case Seq(s, Literal(m: Long, _)) => PolyHash(s, m)
        // Plain int literals parse as IntegerType — widen rather than reject.
        case Seq(s, Literal(m: Int, _)) => PolyHash(s, m.toLong)
        case _ => throw new IllegalArgumentException(
          "poly_hash(str[, mod]) takes a string and an optional integer literal modulus")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => graft.GraftExtensions.withIntArgs("minhash_signature", exprs, 8, 3)(
        MinHashSignature.apply),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash",
      exprs => graft.GraftExtensions.withIntArgs("simhash", exprs, 16, 3)(
        SimHash.apply),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cell_fixed",
      {
        case Seq(v, c) => graft.functions.expressions.NearestCellFixed(v, c)
        case _ => throw new IllegalArgumentException(
          "nearest_cell_fixed(vec, cents) takes a long-array vector and a " +
            "array<struct<cell, cv>> centroid list")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "script_mix",
      {
        case Seq(t) => graft.functions.expressions.ScriptMix(t)
        case _ => throw new IllegalArgumentException(
          "script_mix(text) takes one string column")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_cell_dist_fixed",
      {
        case Seq(v, c) => graft.functions.expressions.MinCellDistFixed(v, c)
        case _ => throw new IllegalArgumentException(
          "min_cell_dist_fixed(vec, cents) takes a long-array vector and a " +
            "array<struct<cell, cv>> center list")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "clean_tokens",
      {
        case Seq(s, arr) => graft.functions.expressions.CleanTokens(
          s, graft.GraftExtensions.stringArrayArg("clean_tokens", arr))
        case _ => throw new IllegalArgumentException(
          "clean_tokens(str, array(stopword, ...)) takes a string column and a literal string array")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "clean_tokens_count",
      {
        case Seq(s, arr) => graft.functions.expressions.CleanTokensCount(
          s, graft.GraftExtensions.stringArrayArg("clean_tokens_count", arr))
        case _ => throw new IllegalArgumentException(
          "clean_tokens_count(str, array(stopword, ...)) takes a string column and a literal string array")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gopher_stats",
      {
        case Seq(s, arr) => graft.functions.expressions.GopherStats(
          s, graft.GraftExtensions.stringArrayArg("gopher_stats", arr))
        case _ => throw new IllegalArgumentException(
          "gopher_stats(str, array(stopword, ...)) takes a string column and a literal string array")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_scrub",
      {
        case Seq(s) => graft.functions.expressions.PiiScrub(s)
        case _ => throw new IllegalArgumentException(
          "pii_scrub(str) takes one string column")
      },
      "built-in")
    // Aggregates: returning the AggregateFunction is enough — the
    // analyzer wraps it in an AggregateExpression (built-in percentile's
    // own registration path).
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg",
      {
        case Seq(v, id, Literal(k: Int, _)) =>
          graft.functions.expressions.BoundedTopKAgg(v, id, k)
        case _ => throw new IllegalArgumentException(
          "topk_agg(value, id, k) takes two columns and an int literal k")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      {
        case Seq(v, Literal(k: Int, _)) =>
          graft.functions.expressions.MisraGriesAgg(v, k)
        case _ => throw new IllegalArgumentException(
          "misra_gries(item, k) takes a string column and an int literal k")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min",
      {
        case Seq(v, Literal(d: Int, _), Literal(w: Int, _)) =>
          graft.functions.expressions.CountMinAgg(
            Cast(v, org.apache.spark.sql.types.LongType), d, w)
        case _ => throw new IllegalArgumentException(
          "count_min(id, depth, width) takes a long column and two int literals")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmin_sketch",
      {
        case Seq(v, Literal(k: Int, _)) =>
          graft.functions.expressions.KminSketchAgg(
            Cast(v, org.apache.spark.sql.types.LongType), k)
        case _ => throw new IllegalArgumentException(
          "kmin_sketch(hash, k) takes a bigint column and an int literal k")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build",
      {
        case Seq(v, Literal(logBits: Int, _), Literal(k: Int, _)) =>
          graft.functions.expressions.BloomBuildAgg(v, logBits, k)
        case _ => throw new IllegalArgumentException(
          "bloom_build(id, logBits, numHashes) takes a bigint column and two int literals")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      {
        case Seq(b, v, Literal(k: Int, _)) =>
          graft.functions.expressions.BloomMightContain(b, v, k)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain(blob, id, numHashes) takes a binary column, a bigint column, and an int literal")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode",
      {
        case Seq(w, Literal(m: org.apache.spark.unsafe.types.UTF8String, _)) =>
          graft.functions.expressions.BpeEncode(w,
            graft.functions.expressions.BpeEncode.parseModel(m.toString))
        case _ => throw new IllegalArgumentException(
          "bpe_encode(word, model) takes a string column and a " +
            "'lhs rhs,lhs rhs,…' model literal")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fixed_point_vector_sum",
      {
        case Seq(v, Literal(s: Long, _)) =>
          graft.functions.expressions.FixedPointVectorSum(v, s)
        case Seq(v, Literal(s: Int, _)) =>
          graft.functions.expressions.FixedPointVectorSum(v, s.toLong)
        case _ => throw new IllegalArgumentException(
          "fixed_point_vector_sum(vec, scale) takes a vector column and an integer literal scale")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_within",
      {
        case Seq(l, r, Literal(tau: Int, _)) =>
          graft.functions.expressions.LevenshteinWithin(l, r, tau)
        case _ => throw new IllegalArgumentException(
          "levenshtein_within(l, r, tau) takes two strings and an int literal tau")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hashed_feature_score",
      {
        case Seq(s) => graft.functions.expressions.HashedFeatureScore(
          s, 1024, graft.operators.Dedup.M)
        case Seq(s, Literal(b: Int, _)) =>
          graft.functions.expressions.HashedFeatureScore(
            s, b, graft.operators.Dedup.M)
        case _ => throw new IllegalArgumentException(
          "hashed_feature_score(text[, buckets]) takes a string column " +
            "and an optional int literal bucket count")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_project",
      {
        case Seq(v, Literal(o: Int, _), Literal(d: Int, _)) =>
          graft.functions.expressions.SignProject(v, o, d, 42L, 1000L)
        case Seq(v, Literal(o: Int, _), Literal(d: Int, _), Literal(s: Int, _)) =>
          graft.functions.expressions.SignProject(v, o, d, s.toLong, 1000L)
        case Seq(v, Literal(o: Int, _), Literal(d: Int, _), Literal(s: Int, _),
            Literal(sc: Int, _)) =>
          graft.functions.expressions.SignProject(v, o, d, s.toLong, sc.toLong)
        case _ => throw new IllegalArgumentException(
          "sign_project(vec, dOut, dim[, seed[, scale]]) takes a vector " +
            "column and int literals")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deletion_variants",
      {
        case Seq(s, Literal(tau: Int, _)) =>
          graft.functions.expressions.DeletionVariants(s, tau)
        case _ => throw new IllegalArgumentException(
          "deletion_variants(s, tau) takes a string and an int literal tau in {1, 2}")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "encode_wav_pcm8",
      {
        case Seq(s) => graft.functions.expressions.EncodeWavPcm8(s)
        case _ => throw new IllegalArgumentException(
          "encode_wav_pcm8(samples) takes one array<int> column")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wav_energy_hash",
      {
        case Seq(b) => graft.functions.expressions.WavEnergyHash(b)
        case _ => throw new IllegalArgumentException(
          "wav_energy_hash(payload) takes one binary column")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "scale_vector",
      {
        case Seq(v, Literal(s: Long, _)) =>
          graft.functions.expressions.ScaleVector(v, s)
        case Seq(v, Literal(s: Int, _)) =>
          graft.functions.expressions.ScaleVector(v, s.toLong)
        case _ => throw new IllegalArgumentException(
          "scale_vector(vec, scale) takes a numeric-array column and an integer literal scale")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks",
      {
        // w accepts Int OR Long literals (`cdc_chunks(t, 3L, 8)` is
        // valid SQL) — widen/narrow rather than fall to the generic
        // error; an out-of-Int-range w still gets the clear message.
        case Seq(s, Literal(w: Int, _), Literal(d: Long, _)) =>
          graft.functions.expressions.CdcChunks(s, w, d, graft.operators.Dedup.M)
        case Seq(s, Literal(w: Int, _), Literal(d: Int, _)) =>
          graft.functions.expressions.CdcChunks(s, w, d.toLong, graft.operators.Dedup.M)
        case Seq(s, Literal(w: Long, _), Literal(d: Long, _)) if w.isValidInt =>
          graft.functions.expressions.CdcChunks(s, w.toInt, d, graft.operators.Dedup.M)
        case Seq(s, Literal(w: Long, _), Literal(d: Int, _)) if w.isValidInt =>
          graft.functions.expressions.CdcChunks(s, w.toInt, d.toLong, graft.operators.Dedup.M)
        case _ => throw new IllegalArgumentException(
          "cdc_chunks(text, w, divisor) takes a string column and two integer literals")
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch",
      {
        case Seq(v, Literal(k: Int, _), qs @ _*) if qs.nonEmpty =>
          graft.functions.expressions.QuantileSketchAgg(v, k,
            qs.map {
              case Literal(q: Double, _) => q
              // bare 0.5 parses as a DECIMAL literal in SQL text
              case Literal(q: org.apache.spark.sql.types.Decimal, _) => q.toDouble
              case other => throw new IllegalArgumentException(
                s"quantile_sketch: quantiles must be numeric literals, got $other")
            })
        case _ => throw new IllegalArgumentException(
          "quantile_sketch(value, k, q1[, q2...]) takes a column, an int " +
            "literal k, and one or more numeric literal quantiles")
      },
      "built-in")
  }
}
