package graft.operators

import org.apache.spark.sql.DataFrame
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
}
