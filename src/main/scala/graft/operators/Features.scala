package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature diagnostics for labeled training data — the "is there any
  * signal in this column" audit run before anyone trains anything: for
  * each candidate feature, the single best threshold split by exact
  * Gini impurity (a depth-1 decision stump, CART's split criterion).
  * A feature whose best split barely beats the base impurity carries no
  * (first-order) signal; one that halves it is doing the work. The
  * chi²/PMI family (q226/q227) audits CATEGORICAL association; this is
  * the ordered-threshold complement.
  */
object Features {

  /** Best binary split per feature, exact integer arithmetic.
    *
    * For a binary label and a threshold v (left = feature <= v, right
    * = feature > v), the weighted Gini impurity in ppm is
    *
    *   G(v) = (2·posL·negL·1e6) div (nL·n) + (2·posR·negR·1e6) div (nR·n)
    *
    * (two truncated integer divisions — pinned; all products in
    * DECIMAL(38,0) so n up to ~1e18 can't overflow). Candidates are the
    * feature's DISTINCT values; the max value (empty right side) is
    * excluded; ties on G break to the SMALLEST threshold. base_ppm =
    * (2·pos·neg·1e6) div (n·n) is the unsplit impurity; gain_ppm =
    * base − best.
    *
    * Scale shape (per feature): one corpus aggregate to the (value,
    * count, positives) table — bounded by the feature's CARDINALITY —
    * then the house two-phase bucket cumsum for the cumulative counts
    * and one combinable struct-min argmin. Features are independent
    * jobs, driver-side plan-assembly union (the fdStrength shape). Rows
    * with a null label or null feature drop for that feature.
    *
    * Output: (feature, threshold, split_ppm, base_ppm, gain_ppm, n) —
    * one row per feature; all-null or single-valued features emit
    * threshold null with split_ppm = base_ppm (no split exists).
    */
  def bestSplit(df: DataFrame, labelCol: String,
                featureCols: Seq[String],
                bucketWidth: Long = 1000L): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(bucketWidth > 0, s"bucketWidth must be positive")
    val dec = "decimal(38,0)"
    val perFeature = featureCols.map { f =>
      val base = df
        .filter(col(labelCol).isNotNull && col(f).isNotNull)
        .select(col(f).cast("long").as("__v"),
          when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      val vt = base.groupBy(col("__v"))
        .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
        .withColumn("__bkt",
          expr(s"(__v - pmod(__v, ${bucketWidth}L)) div ${bucketWidth}L"))
      val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inCum = vt
        .withColumn("__cc", sum(col("__c")).over(wIn))
        .withColumn("__cp", sum(col("__p")).over(wIn))
      val wOff = Window.orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = vt.groupBy(col("__bkt"))
        .agg(sum(col("__c")).as("__tc"), sum(col("__p")).as("__tp"))
        .withColumn("__oc", coalesce(sum(col("__tc")).over(wOff), lit(0L)))
        .withColumn("__op", coalesce(sum(col("__tp")).over(wOff), lit(0L)))
        .select(col("__bkt"), col("__oc"), col("__op"))
      val tot = base.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
      val cand = inCum.join(offsets, "__bkt")
        .select(col("__v"),
          (col("__cc") + col("__oc")).as("__nl"),
          (col("__cp") + col("__op")).as("__pl"))
        .crossJoin(broadcast(tot))
        .filter(col("__nl") < col("__n")) // empty right side excluded
        .withColumn("__split",
          expr(s"(CAST(2 AS $dec) * __pl * (__nl - __pl)" +
            s" * 1000000) div (CAST(__nl AS $dec) * __n)" +
            s" + (CAST(2 AS $dec) * (__pos - __pl)" +
            s" * ((__n - __nl) - (__pos - __pl))" +
            s" * 1000000) div (CAST(__n - __nl AS $dec) * __n)")
            .cast("long"))
      val best = cand
        .agg(min(struct(col("__split"), col("__v"))).as("__b"))
        .select(col("__b.__v").as("threshold"),
          col("__b.__split").as("split_ppm"))
      best.crossJoin(broadcast(tot))
        .select(lit(f).as("feature"),
          col("threshold"),
          coalesce(col("split_ppm"),
            expr(s"(CAST(2 AS $dec) * __pos * (__n - __pos) * 1000000)" +
              s" div (CAST(__n AS $dec) * __n)").cast("long"))
            .as("split_ppm"),
          expr(s"(CAST(2 AS $dec) * __pos * (__n - __pos) * 1000000)" +
            s" div (CAST(__n AS $dec) * __n)").cast("long").as("base_ppm"),
          col("__n").as("n"))
        .withColumn("gain_ppm", col("base_ppm") - col("split_ppm"))
        .select(col("feature"), col("threshold"), col("split_ppm"),
          col("base_ppm"), col("gain_ppm"), col("n"))
    }
    perFeature.reduce(_.unionByName(_))
  }
}
