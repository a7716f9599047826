package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k per group via rank-filter. The window's partitionBy exchange is the
  * only shuffle; with AQE, skewed groups split automatically. The ordering
  * must be total (callers append a unique tiebreak column) for deterministic
  * results.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
               rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
