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
