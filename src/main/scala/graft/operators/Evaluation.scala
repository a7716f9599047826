package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact classifier-evaluation statistics over unbounded corpora.
  *
  * Completes the corpus-health family: q176 ships the reliability table
  * (calibration — is the score's CONFIDENCE honest?), this module ships the
  * exact ROC AUC (discrimination — does the score RANK positives above
  * negatives?). A pipeline trusts a filter threshold only when both hold.
  */
object Evaluation {

  /** Exact ROC AUC per group via the rank-sum identity (Mann–Whitney U;
    * the AUC equivalence is Hanley & McNeil 1982) with midrank tie
    * handling, in exact integer arithmetic both engines replay:
    *
    *   AUC = Σ_v p_v · (negBelow_v + q_v / 2) / (n1 · n0)
    *
    * summed over distinct score values v with p_v positives and q_v
    * negatives at v, negBelow_v = negatives at strictly smaller scores.
    * The half from midranks is cleared by doubling: u2 = Σ p_v ·
    * (2·negBelow_v + q_v), auc_ppm = (1e6 · u2) div (2 · n1 · n0) —
    * every operand non-negative, so truncating (Spark `div`) and floor
    * (DuckDB `//`) division agree. Products run in DECIMAL(38,0): u2 is
    * bounded by n1·n0, so the ppm numerator stays inside 38 digits up to
    * ~1e15 labeled rows per group.
    *
    * Scale shape: one corpus aggregate to the per-group distinct-score
    * table (bounded by score cardinality, the q222 distinct-value class —
    * NOT corpus-sized for any integer score), then the house two-phase
    * bucket cumsum for the negatives-below prefix: in-bucket exclusive
    * prefix under a window partitioned by (group, score-range bucket),
    * plus one offset pass over the bounded per-group bucket table. No
    * global-order window over raw rows; the corpus is never rejoined.
    *
    * Output per group: (groupCol, n_pos, n_neg, auc_ppm), auc_ppm null
    * when either class is empty (AUC undefined). Null scores/labels are
    * excluded (no label ≠ negative label).
    */
  def aucByGroup(df: DataFrame, scoreCol: String, labelCol: String,
                 groupCol: String, bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dec = "decimal(38,0)"
    val vt = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(scoreCol).cast("long").as("__v"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__q"))
      .withColumn("__bkt",
        floor(col("__v").cast("double") / bucketWidth).cast("long"))
    // In-bucket EXCLUSIVE prefix of negatives (strictly-below semantics).
    val wIn = Window.partitionBy(col("__g"), col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inCum = vt.withColumn("__iq", coalesce(sum(col("__q")).over(wIn), lit(0L)))
    // Bucket offsets over the bounded per-group bucket table.
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vt.groupBy(col("__g"), col("__bkt"))
      .agg(sum(col("__q")).as("__tq"))
      .withColumn("__oq", coalesce(sum(col("__tq")).over(wOff), lit(0L)))
      .select(col("__g"), col("__bkt"), col("__oq"))
    val perGroup = inCum.join(offsets, Seq("__g", "__bkt"))
      .withColumn("__nb", (col("__iq") + col("__oq")).cast(dec))
      .groupBy(col("__g"))
      .agg(
        sum(col("__p").cast(dec) *
          (col("__nb") * lit(2) + col("__q").cast(dec))).as("__u2"),
        sum(col("__p")).cast(dec).as("__n1"),
        sum(col("__q")).cast(dec).as("__n0"))
    perGroup.select(
      col("__g").as(groupCol),
      col("__n1").cast("long").as("n_pos"),
      col("__n0").cast("long").as("n_neg"),
      when(col("__n1") > 0 && col("__n0") > 0,
        expr("(__u2 * CAST(1000000 AS DECIMAL(38,0))) div " +
          "(CAST(2 AS DECIMAL(38,0)) * __n1 * __n0)").cast("long"))
        .as("auc_ppm"))
  }

  /** Ranked-retrieval quality readout — the RETRIEVAL complement of
    * [[aucByGroup]] (AUC scores a classifier's global ordering; this
    * scores a per-query TOP-K list): exact-ppm MRR, precision@k,
    * recall@k, and AP@k per query, in the integer contract both engines
    * replay. The eval harness for the ANN family (q41/q42/q66/q74) and
    * any retrieval-backed curation step — a similarity index is only as
    * good as what it RANKS first.
    *
    * Integer contract (every division truncating, operands
    * non-negative):
    *   mrr_ppm      = 1e6 div first_rel_rank          (0 if none in k)
    *   p_at_k_ppm   = (1e6 · rel_in_k) div k
    *   recall_ppm   = (1e6 · rel_in_k) div n_rel_total (null if 0 total)
    *   ap_at_k_ppm  = (Σ_{rel i≤k} (1e6·hits_i) div i) div min(k, total)
    * where hits_i = relevant results at ranks ≤ i. The per-rank inner
    * truncation is part of the contract (documented, oracle-replayed).
    *
    * Scale shape: `ranked` holds ≤ k rows per query by contract, so the
    * running-hits window partitions into k-row groups — bounded,
    * never corpus-sized; the totals join is query-table-sized. One
    * aggregate to the per-query row.
    *
    * @param ranked  (queryCol, rankCol 1..k, relCol boolean) — the
    *                top-k lists under audit
    * @param totals  (queryCol, totalCol) — relevant items per query in
    *                the WHOLE corpus (the recall denominator)
    */
  /** The readout over [[graft.streaming.RankingEvalStream]]'s upserted
    * per-query partial rows — the reader side of the B110 ingest twin
    * (the `kappaFromCells` convention): `partials` carries
    * (queryCol, n_rel_k, first_rel_rank — 0 while none, apn — the
    * Σ (1e6·hits_i) div i numerator), and this joins the recall/AP
    * denominators and emits exactly [[rankingReport]]'s columns, so
    * batch == stream reduces to partial-table equality.
    */
  def reportFromPartials(partials: DataFrame, queryCol: String,
                         totals: DataFrame, totalCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    partials
      .select(col(queryCol), col("n_rel_k").cast("long").as("n_rel_k"),
        col("first_rel_rank").cast("long").as("__fr"),
        col("apn").cast("long").as("__apn"))
      .join(totals.select(col(queryCol),
        col(totalCol).cast("long").as("__tot")), Seq(queryCol), "left")
      .select(col(queryCol),
        col("n_rel_k"),
        when(col("__fr") > 0, col("__fr")).as("first_rel_rank"),
        when(col("__fr") > 0, expr("1000000 div __fr")).otherwise(lit(0L))
          .as("mrr_ppm"),
        expr(s"(1000000 * n_rel_k) div $k").as("p_at_k_ppm"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          expr("(1000000 * n_rel_k) div __tot")).as("recall_at_k_ppm"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          expr(s"__apn div least(CAST($k AS BIGINT), __tot)"))
          .as("ap_at_k_ppm"))
  }

  def rankingReport(ranked: DataFrame, queryCol: String, rankCol: String,
                    relCol: String, totals: DataFrame, totalCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(queryCol)).orderBy(col("__r"))
    val withHits = ranked
      .select(col(queryCol), col(rankCol).cast("long").as("__r"),
        col(relCol).cast("boolean").as("__rel"))
      .withColumn("__hits",
        sum(when(col("__rel"), 1L).otherwise(0L)).over(w))
    val perQuery = withHits.groupBy(col(queryCol))
      .agg(
        sum(when(col("__rel"), 1L).otherwise(0L)).as("n_rel_k"),
        min(when(col("__rel"), col("__r"))).as("first_rel_rank"),
        sum(when(col("__rel"),
          expr("(1000000 * __hits) div __r"))).as("__apn"))
    perQuery
      .join(totals.select(col(queryCol),
        col(totalCol).cast("long").as("__tot")), Seq(queryCol), "left")
      .select(col(queryCol),
        col("n_rel_k"),
        col("first_rel_rank"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("mrr_ppm"),
        expr(s"(1000000 * n_rel_k) div $k").as("p_at_k_ppm"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          expr("(1000000 * n_rel_k) div __tot")).as("recall_at_k_ppm"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          expr(s"coalesce(__apn, 0) div least(CAST($k AS BIGINT), __tot)"))
          .as("ap_at_k_ppm"))
  }
}
