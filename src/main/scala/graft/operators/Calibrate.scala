package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-group score calibration by quantile normalization — the
  * DISTRIBUTION-level alignment [[RankFusion]]'s Borda ranks skip: two
  * scorers (or two sources' quality columns) are incomparable in raw
  * units, and z-scoring assumes shape. Quantile normalization maps each
  * group's value to the GLOBAL value at the same quantile — after it,
  * every group's distribution IS the global one (the microarray/
  * learning-to-rank standard), so thresholds and fusion weights mean
  * the same thing everywhere.
  */
object Calibrate {

  /** Per-(group, value) quantile-normalization mapping table.
    *
    * Exact integer contract (both engines replay it):
    *  - within a group, a distinct value with count c after an
    *    exclusive prefix cp occupies ranks [cp+1, cp+c]; its MIDRANK
    *    doubled is 2·cp + c + 1 (ties interchangeable — no within-tie
    *    order to disagree on, the Gini rule);
    *  - its quantile position p_ppm = (2·cp + c + 1)·1e6 div (2·n_g)
    *    (truncating — strictly inside (0, 1e6));
    *  - the normalized value is the GLOBAL distribution's value at rank
    *    R = max(1, ceil(p_ppm·N div 1e6)) — PERCENTILE_DISC semantics
    *    with midrank probing.
    *
    * Scale shape: one corpus aggregate to the per-(group, value) table
    * and one to the global value table (both bounded by the signal's
    * CARDINALITY, not the corpus — the q222/q224/q234 class); prefix
    * sums via the house two-phase bucket cumsum (no global-order
    * window); the rank→value probe is the q221 broadcast interval
    * lookup (codegen binary search, maxIntervals guard fails loudly if
    * the signal's cardinality outgrows the broadcast contract).
    *
    * Output: (groupCol, valueCol, n, p_ppm, normalized) — one row per
    * distinct (group, value); join it back to rows as needed.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        bucketWidth: Long = 1000L,
                        maxDistinct: Int = 4000000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))

    // per-(group, value) counts with the exclusive per-group prefix
    val vt = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__bkt",
        expr(s"(__v - pmod(__v, ${bucketWidth}L)) div ${bucketWidth}L"))
    val wIn = Window.partitionBy(col("__g"), col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inCum = vt.withColumn("__ic",
      coalesce(sum(col("__c")).over(wIn), lit(0L)))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vt.groupBy(col("__g"), col("__bkt"))
      .agg(sum(col("__c")).as("__tc"))
      .withColumn("__oc", coalesce(sum(col("__tc")).over(wOff), lit(0L)))
      .select(col("__g"), col("__bkt"), col("__oc"))
    val grouped = inCum.join(offsets, Seq("__g", "__bkt"))
      .withColumn("__cp", col("__ic") + col("__oc"))
    val ng = base.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val probes = grouped.join(ng, "__g")
      .withColumn("__p",
        expr("((2L * __cp + __c + 1L) * 1000000L) div (2L * __n)"))

    // global distinct-value table with [lo, hi) rank intervals
    val gvt = base.groupBy(col("__v")).agg(count(lit(1)).as("__gc"))
      .withColumn("__bkt",
        expr(s"(__v - pmod(__v, ${bucketWidth}L)) div ${bucketWidth}L"))
    val gIn = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gCum = gvt.withColumn("__ic",
      coalesce(sum(col("__gc")).over(gIn), lit(0L)))
    val gOffW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gOffsets = gvt.groupBy(col("__bkt"))
      .agg(sum(col("__gc")).as("__tc"))
      .withColumn("__oc", coalesce(sum(col("__tc")).over(gOffW), lit(0L)))
      .select(col("__bkt"), col("__oc"))
    val dim = gCum.join(gOffsets, "__bkt")
      .select(col("__v").as("__target"),
        (col("__ic") + col("__oc") + 1L).as("__lo"),
        (col("__ic") + col("__oc") + col("__gc") + 1L).as("__hi"))
    val nTab = base.agg(count(lit(1)).as("__tot"))

    val withRank = probes.crossJoin(broadcast(nTab))
      .withColumn("__R",
        greatest(lit(1L), expr("(__p * __tot + 999999L) div 1000000L")))
    Joins.intervalLookup(withRank, col("__R"), dim, "__lo", "__hi",
        maxIntervals = maxDistinct)
      .select(col("__g").as(groupCol), col("__v").as(valueCol),
        col("__c").as("n"), col("__p").as("p_ppm"),
        col("__target").as("normalized"))
  }
}
