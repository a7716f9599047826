package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion quality ensembling: combine several document quality
  * scorers (a hashed-feature classifier, an LM fluency score, a length
  * prior, ...) by summing each document's GLOBAL rank under every scorer
  * — the Borda count. Rank fusion is the standard way to mix scorers
  * whose scales are incomparable (a logit, an integer count ratio, a
  * token count): ranks are scale-free, and the fused order is far more
  * robust to one scorer's outliers than any weighted score sum.
  *
  * Scale shape: a global rank is the textbook global-order window — one
  * task sees the corpus. Here each scorer's rank comes from
  * [[Budget.takeByBudget]] with unit costs (rank = the running count in
  * (score desc, id asc) order), i.e. the house two-phase bucket cumsum:
  * in-bucket ranks are parallel over score-range buckets, and only
  * BUCKET TOTALS cross a single partition. The per-scorer rank frames
  * join back on the unique id (k equi-joins of corpus-sized frames that
  * AQE plans as one shuffle each; at 100 TB the scorer frames are
  * usually projections of ONE signal pass, so the joins co-partition).
  */
object RankFusion {

  /** Global 1-based rank of every row in (scoreCol desc, idCol asc)
    * order, without a global-order window. Scores must be integral
    * (cast to long). Output: (idCol, rank).
    */
  def globalRank(df: DataFrame, idCol: String, scoreCol: String,
                 bucketWidth: Long = 1000L): DataFrame =
    Budget.takeByBudget(
        df.select(col(idCol), col(scoreCol)).withColumn("__one", lit(1L)),
        idCol, scoreCol, "__one", budget = Long.MaxValue, bucketWidth)
      .select(col(idCol), col("cum_cost").as("rank"))

  /** Borda fusion of `scoreCols` (all integral, higher = better): per
    * scorer the [[globalRank]], fused as the rank SUM (lower = better),
    * plus the fused global rank (ties broken by id — a deterministic
    * total order). Output: (idCol, rank_<scorer>..., borda, fused_rank).
    */
  def borda(df: DataFrame, idCol: String, scoreCols: Seq[String],
            bucketWidth: Long = 1000L): DataFrame = {
    require(scoreCols.nonEmpty, "need at least one scorer")
    val ranked = scoreCols
      .map(sc => globalRank(df.select(col(idCol), col(sc)), idCol, sc,
        bucketWidth).withColumnRenamed("rank", s"rank_$sc"))
      .reduce(_.join(_, idCol))
    val summed = ranked.withColumn("borda",
      scoreCols.map(sc => col(s"rank_$sc")).reduce(_ + _))
    // Fused order: borda asc = score desc under takeByBudget's (score
    // desc, id asc) contract, so rank on the NEGATED borda sum.
    globalRank(summed.withColumn("__neg", -col("borda")), idCol, "__neg",
        bucketWidth)
      .withColumnRenamed("rank", "fused_rank")
      .join(summed, idCol)
      .select((col(idCol) +: scoreCols.map(sc => col(s"rank_$sc")) :+
        col("borda") :+ col("fused_rank")): _*)
  }
}
