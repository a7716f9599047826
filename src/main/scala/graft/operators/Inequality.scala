package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality statistics — "is this source 10M documents
  * or 3 mega-documents and dust?" Two corpora with identical token
  * totals and document counts can have wildly different size
  * concentration, and packing efficiency, dedup pair volume, and quota
  * design all depend on it. The Gini coefficient is the standard scalar
  * for that shape.
  */
object Inequality {

  /** Exact per-group Gini coefficient of a non-negative integer signal,
    * via the rank (Lorenz) form in exact integer arithmetic:
    *
    *   G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)
    *
    * computed on the per-group DISTINCT-VALUE table: a value v with
    * count c occupying positions C_prev+1 … C_prev+c contributes
    * v·(2·c·C_prev + c·(c+1)) to the doubled rank sum — tied values are
    * interchangeable, so no within-tie order exists to disagree on.
    * gini_ppm = ((S₂ − (n+1)·T)·1e6) div (n·T) in DECIMAL(38,0), null
    * for empty/zero-total groups. Negative values are rejected by
    * filter (Gini is defined for non-negative signals; document counts
    * and token counts qualify).
    *
    * Scale shape: one corpus aggregate to the per-group value table
    * (bounded by the signal's cardinality — the q222/q224 class), the
    * house two-phase bucket cumsum for the exclusive count prefix, one
    * bounded per-group rollup. The corpus is scanned once and never
    * rejoined.
    *
    * Output: (groupCol, n, total, gini_ppm) — 0 = perfectly equal,
    * → 1e6 as one row holds everything.
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dec = "decimal(38,0)"
    val vt = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull &&
        col(valueCol) >= 0)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__bkt", expr(s"__v div ${bucketWidth}L"))
    val wIn = Window.partitionBy(col("__g"), col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inCum = vt.withColumn("__ic", coalesce(sum(col("__c")).over(wIn), lit(0L)))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vt.groupBy(col("__g"), col("__bkt"))
      .agg(sum(col("__c")).as("__tc"))
      .withColumn("__oc", coalesce(sum(col("__tc")).over(wOff), lit(0L)))
      .select(col("__g"), col("__bkt"), col("__oc"))
    inCum.join(offsets, Seq("__g", "__bkt"))
      .withColumn("__cp", (col("__ic") + col("__oc")).cast(dec))
      .groupBy(col("__g"))
      .agg(
        sum(expr(s"CAST(__v AS $dec) * (CAST(2 AS $dec) * __c * __cp" +
          s" + CAST(__c AS $dec) * (__c + 1))")).as("__s2"),
        sum(col("__c")).cast(dec).as("__n"),
        sum(col("__c") * col("__v")).cast(dec).as("__t"))
      .select(col("__g").as(groupCol),
        col("__n").cast("long").as("n"),
        col("__t").cast("long").as("total"),
        when(col("__n") > 0 && col("__t") > 0,
          expr("((__s2 - (__n + 1) * __t) * CAST(1000000 AS DECIMAL(38,0)))" +
            " div (__n * __t)").cast("long")).as("gini_ppm"))
  }
}
