package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive for recurring
  * crawls/ingests: classify every document id across two snapshots as
  * added / removed / changed / unchanged by comparing a content
  * fingerprint, never the full text. `/root/reference` has no analytics
  * surface; part of the training-data-pipeline inventory (SURVEY.md §2
  * Part B).
  *
  * Scale shape (two ~100 TB snapshots):
  *   - the fingerprint (md5 / [[Dedup.polyHash]] of the content) is
  *     computed per-row BEFORE the join, so only (id, fingerprint)
  *     pairs cross the wire — the join payload is tens of bytes per
  *     document regardless of document size;
  *   - one hash-partitioned full-outer equi-join on the id (AQE splits
  *     skewed partitions); with both snapshots bucketed by id on disk
  *     (`runtime/TableLayout`) the exchange disappears entirely — the
  *     standing layout for a snapshot store that diffs every ingest;
  *   - no windows and no global order anywhere.
  */
object Snapshot {

  /** Diff two snapshots keyed by `idCol`, comparing `fingerprintCol`.
    * Output: idCol, old_fp, new_fp, status — where status is `added`
    * (id only in `newDf`), `removed` (only in `oldDf`), `changed`
    * (both, fingerprints differ) or `unchanged`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           fingerprintCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), col(fingerprintCol).as("old_fp"))
    val n = newDf.select(col(idCol), col(fingerprintCol).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Token-distribution drift between two snapshots — the monitoring
    * table a recurring-crawl pipeline alerts on (a crawler config
    * change shows up as vocabulary drift long before downstream evals
    * move). Output: the `topK` biggest per-token frequency movers
    * (ppm_old/ppm_new are floor(1e6 · cnt/total) — exact integer
    * parts-per-million, engine-portable) plus the corpus-level L1
    * drift (Σ|Δppm| over ALL tokens, not just the movers) carried on
    * every row.
    *
    * Scale shape: one tagged union + ONE combinable per-token
    * aggregate (a hot token collapses map-side); totals are a 1-row
    * broadcast; the movers cut is a distributed TakeOrdered, and the
    * L1 sum is a second bounded aggregate over the per-token ppm
    * table — no windows, no joins on corpus-sized keys.
    */
  def tokenDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
                 topK: Int = 20): DataFrame = {
    val tagged = oldDf.select(explode(split(col(textCol), " ")).as("tok"),
        lit(1L).as("__o"), lit(0L).as("__n"))
      .unionAll(newDf.select(explode(split(col(textCol), " ")).as("tok"),
        lit(0L).as("__o"), lit(1L).as("__n")))
    val counts = tagged.groupBy(col("tok"))
      .agg(sum(col("__o")).as("cnt_old"), sum(col("__n")).as("cnt_new"))
    val totals = counts.agg(sum(col("cnt_old")).as("__to"),
      sum(col("cnt_new")).as("__tn"))
    val ppm = counts.crossJoin(broadcast(totals))
      .select(col("tok"), col("cnt_old"), col("cnt_new"),
        expr("(1000000L * cnt_old) div greatest(__to, 1L)").as("ppm_old"),
        expr("(1000000L * cnt_new) div greatest(__tn, 1L)").as("ppm_new"))
      .withColumn("ppm_diff", col("ppm_new") - col("ppm_old"))
    val l1 = ppm.agg(sum(abs(col("ppm_diff"))).as("l1_drift_ppm"))
    ppm.orderBy(abs(col("ppm_diff")).desc, col("tok").asc).limit(topK)
      .crossJoin(broadcast(l1))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic — the NUMERIC drift
    * check next to [[tokenDrift]]'s categorical one: the largest ECDF
    * gap between two groups' integral signal distributions (score
    * drift between sources/languages/snapshots; the classic trigger
    * for "retrain/recalibrate the quality scorer"). All arithmetic is
    * exact: D = max_v |cumA(v)·nB − cumB(v)·nA| / (nA·nB), computed by
    * cross-multiplication in DECIMAL(38,0) (at 10¹² rows the products
    * pass a long) and reported as floored ppm; the argmax value comes
    * back too (smallest v on ties — deterministic).
    *
    * Scale shape: one pass to the distinct-value table (bounded by the
    * signal's cardinality, with both groups' counts in the same row),
    * then the house two-phase cumsum — in-bucket prefix sums under a
    * window PARTITIONED by value-range bucket, plus one bucket-offset
    * pass over the bounded bucket table. No global-order window over
    * an unbounded input.
    *
    * Output (1 row): (n_a, n_b, ks_ppm, at_value).
    */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              ga: String, gb: String, bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dec = "decimal(38,0)"
    val v = df
      .filter(col(groupCol).isin(ga, gb) && col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__v"), col(groupCol).as("__g"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__g") === ga, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === gb, 1L).otherwise(0L)).as("__cb"))
      .withColumn("__bkt", floor(col("__v").cast("double") / bucketWidth)
        .cast("long"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val inCum = v
      .withColumn("__ia", sum(col("__ca")).over(wIn))
      .withColumn("__ib", sum(col("__cb")).over(wIn))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = v.groupBy(col("__bkt"))
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
      .withColumn("__oa", coalesce(sum(col("__ta")).over(wOff), lit(0L)))
      .withColumn("__ob", coalesce(sum(col("__tb")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__oa"), col("__ob"))
    val tot = v.agg(sum(col("__ca")).cast(dec).as("__na"),
      sum(col("__cb")).cast(dec).as("__nb"))
    inCum.join(offsets, "__bkt")
      .crossJoin(broadcast(tot))
      .withColumn("__diff",
        abs((col("__ia") + col("__oa")).cast(dec) * col("__nb") -
          (col("__ib") + col("__ob")).cast(dec) * col("__na")))
      .agg(max(struct(col("__diff").as("d"), (-col("__v")).as("nv"),
        col("__na").as("na"), col("__nb").as("nb"))).as("s"))
      .select(col("s.na").cast("long").as("n_a"),
        col("s.nb").cast("long").as("n_b"),
        expr("(s.d * CAST(1000000 AS DECIMAL(38,0))) div (s.na * s.nb)")
          .cast("long").as("ks_ppm"),
        (-col("s.nv")).as("at_value"))
  }
}
