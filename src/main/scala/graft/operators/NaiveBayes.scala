package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based Naive Bayes gate (Maron 1961; the add-one smoothing is
  * Laplace's rule of succession) — the cheapest supervised baseline a
  * data pipeline can field: train is ONE counting pass, the model is a
  * handful of bounded contingency tables, and scoring is a few
  * broadcast joins. The q272 stump audit asks "does this column carry
  * signal alone"; this trains the standard multi-feature baseline on a
  * deterministic hash split and reports the holdout confusion matrix —
  * the number a heavier model must beat to justify itself. The split
  * gate is [[Sampling.mixedBucket]] (square-recombined): the plain
  * affine hash stripes on dense small id spaces (the q291 lesson) and
  * its raw `id * 1000003` multiply silently wraps in Spark for
  * |id| > ~9.2e12 while DuckDB errors on BIGINT overflow; mixedBucket
  * pre-mods the id so every op stays in-range in both engines.
  *
  * Determinism: every model statistic is an exact integer (class
  * priors n_c, per-feature Laplace counts cnt+1, denominators
  * n_c + V_f with V_f the train-side distinct-value count). The argmax
  * cross-multiplies the two posteriors into two products of those
  * integers; with several features the products outgrow DECIMAL(38),
  * so both sides are evaluated as LEFT-ASSOCIATIVE double
  * multiplication chains written identically in both engines (the
  * q286 house rule: each factor is an exact integer below 2^53, each
  * multiplication is one correctly-rounded IEEE op, same sequence →
  * identical result). Ties predict false (strict >).
  *
  * Scale shape: one corpus pass to split + featurize, one bounded
  * aggregate per feature (cardinality-bounded contingency tables,
  * broadcast to the eval side), one eval pass. Nothing corpus² and no
  * iteration. Class balance is validated in-plan (raise_error on a
  * single-class train split — scoring would silently degenerate).
  *
  * Output (≤4 rows): (actual, predicted, n, share_ppm) over the
  * holdout, share_ppm of the eval total.
  */
object NaiveBayes {

  def confusionGate(df: DataFrame, idCol: String, labelCol: String,
                    featureCols: Seq[String],
                    trainPermille: Int = 800): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(trainPermille > 0 && trainPermille < 1000,
      s"trainPermille must be in (0, 1000), got $trainPermille")
    val base = df
      .filter(col(idCol).isNotNull && col(labelCol).isNotNull &&
        featureCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__train",
        Sampling.mixedBucket(col(idCol)) < trainPermille)
    val train = base.filter(col("__train"))
    val eval0 = base.filter(!col("__train"))
    // Class priors; a single-class train split makes every posterior
    // comparison vacuous — fail loudly (1-row table pays the check).
    val priors = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("__n1"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("__n0"))
      .withColumn("__n1", when(col("__n1") > 0 && col("__n0") > 0,
        col("__n1")).otherwise(raise_error(
          lit("naive bayes needs both classes in the train split"))))
    // Per feature: the (value, count|class) contingency table + the
    // train vocabulary size V_f — all cardinality-bounded, broadcast.
    var scored = eval0.crossJoin(broadcast(priors))
    featureCols.zipWithIndex.foreach { case (f, i) =>
      val tab = train.groupBy(col(f))
        .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as(s"__c1_$i"),
          sum(when(col(labelCol), 0L).otherwise(1L)).as(s"__c0_$i"))
      val vf = tab.agg(count(lit(1)).as(s"__v_$i"))
      scored = scored
        .join(broadcast(tab), Seq(f), "left")
        .crossJoin(broadcast(vf))
        .withColumn(s"__c1_$i", coalesce(col(s"__c1_$i"), lit(0L)))
        .withColumn(s"__c0_$i", coalesce(col(s"__c0_$i"), lit(0L)))
    }
    // score(c) ∝ n_c · Π (cnt_{f,c}+1) · Π_{c'≠c} (n_{c'}+V_f): the
    // cross-multiplied posterior comparison with every division
    // cleared. Left-associative double chains, same order both engines.
    def chain(first: Column, rest: Seq[Column]): Column =
      rest.foldLeft(first.cast("double"))((acc, c) => acc * c.cast("double"))
    val lhs = chain(col("__n1"),
      featureCols.indices.flatMap(i => Seq(
        col(s"__c1_$i") + 1L, col("__n0") + col(s"__v_$i"))))
    val rhs = chain(col("__n0"),
      featureCols.indices.flatMap(i => Seq(
        col(s"__c0_$i") + 1L, col("__n1") + col(s"__v_$i"))))
    val conf = scored
      .select(col(labelCol).as("actual"), (lhs > rhs).as("predicted"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val tot = conf.agg(sum(col("n")).as("__tot"))
    conf.crossJoin(broadcast(tot))
      .select(col("actual"), col("predicted"), col("n"),
        expr("(n * 1000000L) div __tot").as("share_ppm"))
  }
}
