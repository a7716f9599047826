package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via hashed n-gram importance weights — the DSIR shape
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169): score every raw-corpus document by
  * how much its hashed n-gram distribution looks like a small target
  * corpus, then keep/resample the top.
  *
  * Determinism re-expression: DSIR's log-likelihood-ratio sum is
  * transcendental, so cross-engine parity would die on libm. Instead
  * each gram contributes the RATIONAL ratio
  * `floor(scale * (t[b]+1) / (r[b]+1))` (add-1 smoothed bucket counts,
  * floored to an integer BEFORE the per-document sum — the BM25 trick:
  * integer sums are order-free, so shuffle order can't change the
  * answer). A monotone per-gram transform of the DSIR ratio; ranking
  * behavior is preserved gram-by-gram.
  *
  * Scale shape: one corpus pass builds the bucket model (groupBy on the
  * hashed bucket — map-side combinable, output BOUNDED at `buckets`
  * rows, which is why the model broadcast is guarded by construction,
  * not by hope); one more pass scores raw grams against the broadcast
  * model and sums per document. No corpus-sized join keys, no windows.
  */
object Dsir {

  /** Importance scores for every raw-side document (those where
    * `targetPred` is false). Grams are token bigrams hashed with
    * [[Dedup.polyHash]] into `buckets` buckets.
    *
    * Output: (idCol, n_grams, imp_score, imp_per_gram), raw docs with
    * at least one bigram.
    */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, buckets: Int = 4096,
                       scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 22),
      s"buckets must be in (0, 2^22] to keep the model broadcastable, got $buckets")
    // Position-explode bigram construction (the LmScore.bigramPairs
    // shape) instead of the shinglesOfTokens transform-HOF: the HOF
    // lambda is INTERPRETED per gram while explode + element_at +
    // concat_ws stay inside whole-stage codegen — measured 3.4x on the
    // whole query at sf0.1 (4.13 s -> 1.22 s). Identical gram strings,
    // same oracle.
    val grams = df.select(col(idCol), targetPred.as("__is_t"),
        split(col(textCol), " ").as("__l"))
      .select(col(idCol), col("__is_t"), col("__l"),
        explode(when(size(col("__l")) < 2, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("__l")) - 1))).as("__i"))
      .select(col(idCol), col("__is_t"),
        (Dedup.polyHash(concat_ws(" ",
          element_at(col("__l"), col("__i")),
          element_at(col("__l"), col("__i") + 1))) % buckets).as("bkt"))
    // Per-(doc, bucket) histogram FIRST: the model pass and the scoring
    // pass both read this one combinable aggregate. `__is_t` is carried
    // as an AGGREGATED column (max over a per-doc constant), not a
    // grouping key — a filter on a grouping key would be pushed below
    // the aggregate into the scan, making the two subtrees differ and
    // forcing a second corpus scan; a filter on an aggregate output
    // cannot be pushed, so both consumers share the identical subtree
    // and AQE reuses its exchange (the q71 pattern; corpus scanned
    // ONCE). It also shrinks the model input and the scoring join from
    // #grams rows to #distinct (doc, bucket) pairs.
    val dh = grams.groupBy(col(idCol), col("bkt"))
      .agg(count(lit(1)).as("__n"),
        max(when(col("__is_t"), 1L).otherwise(0L)).as("__t"))
    val model = dh.groupBy(col("bkt")).agg(
        sum(when(col("__t") === 1L, col("__n")).otherwise(0L)).as("tcnt"),
        sum(when(col("__t") === 0L, col("__n")).otherwise(0L)).as("rcnt"))
      .select(col("bkt"),
        expr(s"($scale * (tcnt + 1)) div (rcnt + 1)").as("contrib"))
    dh.filter(col("__t") === 0L)
      .join(broadcast(model), "bkt")
      .groupBy(col(idCol))
      .agg(sum(col("__n")).cast("long").as("n_grams"),
        sum(col("__n") * col("contrib")).as("imp_score"))
      .withColumn("imp_per_gram",
        col("imp_score").cast("double") / col("n_grams"))
  }

  /** The (bkt, contrib) bucket-model table alone — fit once on a
    * reference corpus + target slice, then score ARRIVING documents
    * against the frozen model with [[scoreAgainst]] (the recurring-
    * ingest shape: refitting on every batch would let the batch shift
    * its own ratios). Bounded at `buckets` rows by construction.
    */
  def fitModel(df: DataFrame, idCol: String, textCol: String,
               targetPred: Column, buckets: Int = 4096,
               scale: Long = 1000000L): DataFrame =
    gramBuckets(df.select(col(idCol), col(textCol),
        targetPred.as("__is_t0")), idCol, textCol, buckets)
      .groupBy(col("bkt")).agg(
        sum(when(col("__is_t"), 1L).otherwise(0L)).as("tcnt"),
        sum(when(!col("__is_t"), 1L).otherwise(0L)).as("rcnt"))
      .select(col("bkt"),
        expr(s"($scale * (tcnt + 1)) div (rcnt + 1)").as("contrib"))

  /** Score `docs` against a FROZEN model from [[fitModel]]. Per-row
    * narrow gram explode + broadcast model join + per-doc aggregate —
    * stateless given the model, so foreachBatch on a stream scores each
    * micro-batch exactly like the batch op (StreamingSpec parity).
    */
  def scoreAgainst(model: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, buckets: Int = 4096,
                   scale: Long = 1000000L): DataFrame =
    gramBuckets(docs.select(col(idCol), col(textCol),
        lit(false).as("__is_t0")), idCol, textCol, buckets)
      .join(broadcast(model), Seq("bkt"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        // a bucket the model never saw smooths to (scale·1) div 1 —
        // the fit formula's own add-1 value at tcnt = rcnt = 0
        sum(coalesce(col("contrib"), lit(scale))).as("imp_score"))
      .withColumn("imp_per_gram",
        col("imp_score").cast("double") / col("n_grams"))

  /** Shared narrow bigram-bucket explode (codegen position form). */
  private def gramBuckets(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int): DataFrame =
    df.select(col(idCol), col("__is_t0"), split(col(textCol), " ").as("__l"))
      .select(col(idCol), col("__is_t0"), col("__l"),
        explode(when(size(col("__l")) < 2, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("__l")) - 1))).as("__i"))
      .select(col(idCol), col("__is_t0").as("__is_t"),
        (Dedup.polyHash(concat_ws(" ",
          element_at(col("__l"), col("__i")),
          element_at(col("__l"), col("__i") + 1))) % buckets).as("bkt"))
}
