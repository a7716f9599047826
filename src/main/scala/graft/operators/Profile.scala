package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** Data-profiling sweep (the "summarize" shape): one uniform stats row per
  * profiled column — rows / nulls / exact distinct / min / max — for data
  * quality dashboards and ingest validation.
  *
  * Each column is one column-pruned single-aggregate scan; the union is
  * driver-side plan assembly, not data movement, and the per-column jobs
  * parallelize independently. Numeric extremes render through
  * DECIMAL(18,2): raw double formatting is engine-specific, decimal
  * strings are portable (the q87 oracle relies on that).
  */
object Profile {

  /** Functional-dependency strength audit — the g3 error of Kivinen &
    * Mannila 1995 as used by TANE (Huhtala et al. 1999): for each
    * candidate FD X → Y, the minimum number of rows to DELETE for the
    * dependency to hold exactly. A group keeps its plurality Y value
    * and sheds the rest, so rows_to_remove = Σ_x (n_x − max_y c_{x,y})
    * and g3_ppm = rows_to_remove·1e6 div n_rows. Binary "holds/fails"
    * FD discovery is useless on real data (one bad row kills every
    * FD); the strength number is what a data-quality dashboard needs.
    * Rows with a null on either side are excluded (SQL FDs are defined
    * over non-null tuples; nulls are the n_nulls column's job).
    *
    * Scale shape per candidate: one corpus aggregate to the distinct
    * (X, Y) table, one re-aggregate to the distinct-X table, one
    * bounded rollup — the corpus is scanned once per candidate and
    * never rejoined (the q222/q234 value-table class). The candidate
    * union is driver-side plan assembly, and the per-candidate jobs
    * are independent.
    *
    * Output, one row per candidate: (fd, n_rows, n_groups,
    * n_violating_groups, rows_to_remove, g3_ppm, holds).
    */
  def fdStrength(df: DataFrame,
                 candidates: Seq[(Seq[String], String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate FD")
    candidates.map { case (xs, y) =>
      require(xs.nonEmpty && !xs.contains(y),
        s"degenerate FD ${xs.mkString(",")} -> $y")
      val pairs = df
        .filter((xs :+ y).map(col(_).isNotNull).reduce(_ && _))
        .groupBy((xs :+ y).map(col): _*).agg(count(lit(1)).as("__c"))
      pairs.groupBy(xs.map(col): _*)
        .agg(sum(col("__c")).as("__n"), max(col("__c")).as("__keep"),
          count(lit(1)).as("__vals"))
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_groups"),
          count(when(col("__vals") > 1, lit(1))).as("n_violating_groups"),
          coalesce(sum(col("__n") - col("__keep")), lit(0L))
            .as("rows_to_remove"))
        .select(lit(s"${xs.mkString(",")}->$y").as("fd"), col("n_rows"),
          col("n_groups"), col("n_violating_groups"), col("rows_to_remove"),
          when(col("n_rows") > 0,
            expr("(CAST(rows_to_remove AS DECIMAL(38,0)) * 1000000)" +
              " div n_rows"))
            .cast("long").as("g3_ppm"),
          (col("rows_to_remove") === 0).as("holds"))
    }.reduce(_.unionAll(_))
  }

  /** Conditional FD strength (Bohannon et al. 2007's CFDs, measured
    * with the same g3 error as [[fdStrength]]): the X → Y strength
    * WITHIN each value of a condition column — the drill-down that
    * finds "the dependency holds everywhere except partition P" (one
    * bad source, one bad day), which the global number averages away.
    * Same aggregation ladder with the condition column prepended to
    * every group key, so the scale shape is unchanged: distinct
    * (cond, X, Y) table → distinct (cond, X) table → per-cond rollup.
    *
    * Output, one row per observed condition value: (condCol, n_rows,
    * n_groups, n_violating_groups, rows_to_remove, g3_ppm, holds).
    */
  def fdStrengthBy(df: DataFrame, condCol: String, xs: Seq[String],
                   y: String): DataFrame = {
    require(xs.nonEmpty && !xs.contains(y) && !xs.contains(condCol) &&
      y != condCol, s"degenerate CFD [$condCol] ${xs.mkString(",")} -> $y")
    val pairs = df
      .filter((condCol +: y +: xs).map(col(_).isNotNull).reduce(_ && _))
      .groupBy((condCol +: xs :+ y).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    pairs.groupBy((condCol +: xs).map(col): _*)
      .agg(sum(col("__c")).as("__n"), max(col("__c")).as("__keep"),
        count(lit(1)).as("__vals"))
      .groupBy(col(condCol))
      .agg(sum(col("__n")).as("n_rows"), count(lit(1)).as("n_groups"),
        count(when(col("__vals") > 1, lit(1))).as("n_violating_groups"),
        sum(col("__n") - col("__keep")).as("rows_to_remove"))
      .select(col(condCol), col("n_rows"), col("n_groups"),
        col("n_violating_groups"), col("rows_to_remove"),
        expr("(CAST(rows_to_remove AS DECIMAL(38,0)) * 1000000)" +
          " div n_rows").cast("long").as("g3_ppm"),
        (col("rows_to_remove") === 0).as("holds"))
  }

  /** Benford first-digit audit (Newcomb 1881, Benford 1938; the
    * classic fabricated-numbers screen — organically-grown magnitudes
    * put ~30.1% of leading digits at 1, invented ones tend uniform):
    * per group, the observed first-digit histogram of a positive
    * numeric column against the Benford expectation, with the maximum
    * absolute deviation in ppm (the exact sup-norm discrepancy; the
    * usual chi² needs nothing float-y this way). The Benford masses
    * log10(1+1/d) ship as exact ppm constants, so the whole audit is
    * integer arithmetic both engines replay.
    *
    * Scale shape: one corpus aggregate to the (group × 9)-row digit
    * histogram, one bounded re-aggregate. Non-positive and null values
    * are excluded (Benford is defined on positive magnitudes) but
    * counted in n_excluded. `valueCol` must be a positive INTEGER
    * magnitude (the house cents discipline) — a float cast would
    * ROUND 9.97 into a leading 1 and 0.4 into a bogus digit 0; the
    * caller owns the cents conversion. Ties on the worst digit break
    * to the smaller digit.
    *
    * Output per group: (groupCol, n_values, n_excluded,
    * max_dev_ppm, worst_digit, d1_ppm — the observed leading-1 share).
    */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // floor(log10(1+1/d) * 1e6) for d = 1..9; off-by-one ulps matter,
    // so these are pinned constants, not computed
    val benfordPpm = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val digitMass = benfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE __dig ", " ", " ELSE 0L END")
    val base = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol),
        when(col(valueCol).isNotNull && col(valueCol) > 0,
          substring(col(valueCol).cast("long").cast("string"), 1, 1)
            .cast("long")).as("__dig"))
    val hist = base.groupBy(col(groupCol), col("__dig"))
      .agg(count(lit(1)).as("__c"))
    val totals = hist.groupBy(col(groupCol))
      .agg(coalesce(sum(when(col("__dig").isNotNull, col("__c"))), lit(0L))
          .as("n_values"),
        coalesce(sum(when(col("__dig").isNull, col("__c"))), lit(0L))
          .as("n_excluded"))
    val dev = hist.filter(col("__dig").isNotNull)
      .join(totals.select(col(groupCol), col("n_values")), Seq(groupCol))
      .select(col(groupCol), col("__dig"),
        expr("(CAST(__c AS DECIMAL(38,0)) * 1000000) div n_values")
          .cast("long").as("__obs"),
        expr(digitMass).as("__exp"))
      .select(col(groupCol), col("__dig"), col("__obs"),
        abs(col("__obs") - col("__exp")).as("__dev"))
    val worst = dev.groupBy(col(groupCol))
      .agg(max(struct(col("__dev"), (-col("__dig")).as("nd"))).as("__w"),
        coalesce(sum(when(col("__dig") === 1, col("__obs"))), lit(0L))
          .as("d1_ppm"))
      .select(col(groupCol), col("__w.__dev").as("max_dev_ppm"),
        (-col("__w.nd")).as("worst_digit"), col("d1_ppm"))
    totals.join(worst, Seq(groupCol), "left")
      .select(col(groupCol), col("n_values"), col("n_excluded"),
        col("max_dev_ppm"), col("worst_digit"), col("d1_ppm"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      val v = if (numeric) col(c).cast(DecimalType(18, 2)) else col(c)
      df.agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, lit(1))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(v).cast("string").as("min_val"),
          max(v).cast("string").as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.union(_))

  /** A declarative data-quality constraint (the Deequ-class check
    * surface — Schelter et al. 2018, "Automating large-scale data
    * quality verification"): each check compiles to exact integer-ppm
    * metrics from ONE pass over its column(s).
    */
  sealed trait Check {
    def name: String
    def column: String
    def thresholdPpm: Long
  }
  /** non-null rows / all rows ≥ threshold. */
  final case class Completeness(column: String, thresholdPpm: Long = 1000000L)
      extends Check { val name = "completeness" }
  /** distinct non-null values / non-null rows ≥ threshold (1e6 = the
    * column is a key). For a composite key pass a concat_ws column.
    */
  final case class Uniqueness(column: String, thresholdPpm: Long = 1000000L)
      extends Check { val name = "uniqueness" }
  /** non-null rows inside [lo, hi] / non-null rows ≥ threshold —
    * bounds compared in exact cents (caller casts).
    */
  final case class BoundedBetween(column: String, lo: Long, hi: Long,
                                  thresholdPpm: Long = 1000000L)
      extends Check { val name = "bounded" }

  /** Constraint verification report — the release gate a pipeline runs
    * before publishing a table: every check becomes one row with its
    * measured metric in exact floored ppm and a pass verdict
    * (metric ≥ threshold; an EMPTY table vacuously passes completeness
    * and uniqueness at metric 1e6 — no row violates — and so does a
    * bounded check over all-null columns, the SQL-convention reading,
    * documented rather than configurable).
    *
    * Scale shape: per check ONE combinable corpus aggregate (the
    * uniqueness check adds that column's distinct shuffle — exact by
    * contract; the HLL sketch is the scale relaxation when ±1% is
    * acceptable); checks are independent jobs, the union is
    * driver-side plan assembly (the [[fdStrength]] shape). No windows,
    * no joins.
    *
    * Output (one row per check, input order): (check, column,
    * metric_ppm, threshold_ppm, pass).
    */
  def constraintReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.map { c =>
      val metric = c match {
        case Completeness(colName, _) =>
          df.agg(
            when(count(lit(1)) === 0, 1000000L).otherwise(
              expr(s"(count($colName) * 1000000L) div count(1)"))
              .as("metric_ppm"))
        case Uniqueness(colName, _) =>
          df.agg(
            when(count(col(colName)) === 0, 1000000L).otherwise(
              expr(s"(count(DISTINCT $colName) * 1000000L)" +
                s" div count($colName)")).as("metric_ppm"))
        case BoundedBetween(colName, lo, hi, _) =>
          df.agg(
            when(count(col(colName)) === 0, 1000000L).otherwise(
              expr(s"(count(CASE WHEN $colName >= ${lo}L AND" +
                s" $colName <= ${hi}L THEN 1 END) * 1000000L)" +
                s" div count($colName)")).as("metric_ppm"))
      }
      metric.select(lit(c.name).as("check"), lit(c.column).as("column_name"),
        col("metric_ppm").cast("long").as("metric_ppm"),
        lit(c.thresholdPpm).as("threshold_ppm"),
        (col("metric_ppm") >= c.thresholdPpm).as("pass"))
    }.reduce(_.unionByName(_))
  }

  /** Per-column statistics drift between two table snapshots — the
    * whylogs/evidently-class monitor a recurring pipeline runs before
    * trusting "the same table, one crawl later": B32's
    * [[Snapshot.diff]] answers WHICH ROWS changed and q222's KS drift
    * compares one column's full distribution; this is the cheap
    * per-column summary sweep (null rate, cardinality, range, mean)
    * that catches a broken extractor in one glance.
    *
    * Metrics per column per side: row count, null ppm, exact distinct
    * count, min/max, and mean in exact MILLI-units
    * (sum·1000 div nonnull through DECIMAL(38,0) — shifted +1e12
    * before the div to pin FLOOR semantics on negative sums; both
    * engines' integer division truncates toward zero identically, the
    * q251 rule). Deltas: null_ppm_delta (B − A), ndv_ratio_ppm
    * (ndv_b·1e6 div max(ndv_a, 1)), mean_shift_milli. Columns must be
    * long-castable — cents/epoch pre-cast by the caller (the q252
    * rule: double→long casting rounds differently across engines).
    *
    * Scale shape: per column per side ONE combinable aggregate (the
    * exact NDV adds that column's distinct shuffle — the
    * [[constraintReport]] uniqueness trade, HLL named as the
    * relaxation); columns are independent jobs, the union is
    * driver-side plan assembly. Empty sides report null mins/means,
    * never divide-by-zero.
    *
    * Output (one row per column): (column_name, n_a, n_b, null_ppm_a,
    * null_ppm_b, null_ppm_delta, ndv_a, ndv_b, ndv_ratio_ppm, min_a,
    * min_b, max_a, max_b, mean_milli_a, mean_milli_b,
    * mean_shift_milli).
    */
  def columnDrift(dfA: DataFrame, dfB: DataFrame,
                  cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val dec = "decimal(38,0)"
    def side(df: DataFrame, c: String, tag: String): DataFrame =
      df.select(col(c).cast("long").as("__v"))
        .agg(count(lit(1)).as(s"n_$tag"),
          when(count(lit(1)) === 0, lit(null).cast("long")).otherwise(
            expr("((count(1) - count(__v)) * 1000000L) div count(1)"))
            .as(s"null_ppm_$tag"),
          count_distinct(col("__v")).as(s"ndv_$tag"),
          min(col("__v")).as(s"min_$tag"),
          max(col("__v")).as(s"max_$tag"),
          when(count(col("__v")) === 0, lit(null).cast("long")).otherwise(
            expr(s"(sum(CAST(__v AS $dec) * 1000 +" +
              s" CAST(1000000000000 AS $dec)) div count(__v)" +
              " - 1000000000000)").cast("long"))
            .as(s"mean_milli_$tag"))
    cols.map { c =>
      side(dfA, c, "a").crossJoin(side(dfB, c, "b"))
        .select(lit(c).as("column_name"),
          col("n_a"), col("n_b"),
          col("null_ppm_a"), col("null_ppm_b"),
          (col("null_ppm_b") - col("null_ppm_a")).as("null_ppm_delta"),
          col("ndv_a"), col("ndv_b"),
          expr("(ndv_b * 1000000L) div greatest(ndv_a, 1L)")
            .as("ndv_ratio_ppm"),
          col("min_a"), col("min_b"), col("max_a"), col("max_b"),
          col("mean_milli_a"), col("mean_milli_b"),
          (col("mean_milli_b") - col("mean_milli_a"))
            .as("mean_shift_milli"))
    }.reduce(_.unionByName(_))
  }

  /** Histogram drift between two table slices (B98) — the
    * DISTRIBUTIONAL monitor [[columnDrift]]'s summary stats can't give:
    * equal means hide a bimodal split; this shows WHERE the mass moved.
    * The PSI-class readout, kept log-free so it stays exact integer:
    * per bin, each side's exact ppm mass and the shift, plus the total
    * variation distance TV = Σ|ppm_a − ppm_b| / 2 — 0 = identical
    * distributions, 1e6 = disjoint (the standard drift alarm feeds off
    * a TV/PSI threshold).
    *
    * Bins are exact integer FLOOR division of the (long, pre-cast by
    * the caller — the q252 cents/epoch rule) value column: floor(v/w)
    * via the remainder-strip idiom, identical in both engines for
    * negative values too. Null values drop (no bin).
    *
    * Scale shape: one combinable aggregate per side to the bounded bin
    * table; totals and the TV sum are one-row broadcasts back onto it.
    * Each corpus side is scanned once.
    *
    * Output: (bin, bin_lo, n_a, n_b, ppm_a, ppm_b, shift_ppm, tv_ppm) —
    * tv_ppm constant across rows (the readout's headline number).
    */
  def histogramDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
                     binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col(valueCol).cast("long").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(floorDiv(col("__v")).as("bin"))
        .agg(count(lit(1)).as(s"n_$tag"))
    val a = side(dfA, "a")
    val b = side(dfB, "b")
    val bins = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = bins.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    val withPpm = bins.crossJoin(broadcast(totals))
      .select(col("bin"), (col("bin") * binWidth).as("bin_lo"),
        col("n_a"), col("n_b"),
        expr("(n_a * 1000000L) div greatest(__ta, 1L)").as("ppm_a"),
        expr("(n_b * 1000000L) div greatest(__tb, 1L)").as("ppm_b"))
      .withColumn("shift_ppm", col("ppm_b") - col("ppm_a"))
    val tv = withPpm.agg(
      expr("sum(abs(shift_ppm)) div 2").as("tv_ppm"))
    withPpm.crossJoin(broadcast(tv))
  }

  /** Referential-integrity audit (B106) — the CROSS-TABLE check the
    * single-table [[constraintReport]] can't express: for each declared
    * FK, how many child rows point at a parent key that does not exist
    * (orphans), in rows and ppm, plus how many DISTINCT key values are
    * orphaned (one bad key × a million rows vs a million bad keys are
    * different bugs).
    *
    * Null child keys are NOT orphans (SQL FK semantics: null opts out
    * of the constraint) — reported separately as null_rows.
    *
    * Scale shape per FK: the child aggregates to its DISTINCT key table
    * first (hot keys collapse map-side), the parent contributes its
    * distinct key table, one co-partitioned left join between the two
    * key tables, then one join back... no — row counts ride the key
    * table as weights, so the parent join moves KEY TABLES only and no
    * second child pass happens. FKs are independent jobs, driver-side
    * plan-assembly union (the fdStrength shape).
    *
    * Output per FK: (fk_name, n_rows, null_rows, orphan_rows,
    * orphan_ppm, orphan_keys).
    */
  def fkOrphans(fks: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(fks.nonEmpty, "need at least one FK to audit")
    fks.map { case (name, child, childKey, parent, parentKey) =>
      val ck = child.select(col(childKey).cast("long").as("__k"))
      val keyTab = ck.filter(col("__k").isNotNull)
        .groupBy(col("__k")).agg(count(lit(1)).as("__w"))
      val pk = parent.select(col(parentKey).cast("long").as("__k"))
        .filter(col("__k").isNotNull).distinct()
        .withColumn("__hit", lit(true))
      val joined = keyTab.join(pk, Seq("__k"), "left")
      val nulls = ck.agg(count(lit(1)).as("__n"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("__nulls"))
      joined.agg(
          coalesce(sum(when(col("__hit").isNull, col("__w"))), lit(0L))
            .as("orphan_rows"),
          coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
            lit(0L)).as("orphan_keys"))
        .crossJoin(broadcast(nulls))
        .select(lit(name).as("fk_name"),
          col("__n").as("n_rows"),
          col("__nulls").as("null_rows"),
          col("orphan_rows"),
          when(col("__n") > col("__nulls"),
            expr("(orphan_rows * 1000000L) div (__n - __nulls)"))
            .as("orphan_ppm"),
          col("orphan_keys"))
    }.reduce(_.unionByName(_))
  }
}
