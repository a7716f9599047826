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

  /** Top-k per group via the bounded aggregate
    * [[graft.functions.expressions.BoundedTopKAgg]] — the scale form of
    * [[perGroup]]: the window version shuffles every group row to one
    * reducer and sorts it; this shuffles at most k pairs per group per
    * input partition (map-side combine) and never sorts the group.
    * Ordering is (valueCol DESC, idCol ASC) — a total order when idCol is
    * unique. Null values/ids are excluded (filter upstream if they matter).
    *
    * Output: groupCols ++ (rn [1..k], value, id), strongest first.
    */
  /** Misra–Gries frequent-item candidates over `item` — see
    * [[graft.functions.expressions.MisraGriesAgg]]. Output: (item,
    * mg_count) sorted strongest-first; counts are lower bounds, and any
    * item with true frequency > n/(k+1) is guaranteed present. Compose
    * with an exact recount of the ≤k candidates for exact heavy hitters
    * (q108).
    */
  def frequentItems(df: DataFrame, item: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.functions.expressions.MisraGriesAgg(
        ColumnBridge.expression(item.cast("string")), k).toAggregateExpression())
    df.agg(agg.as("__mg"))
      .select(explode(col("__mg")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("mg_count"))
  }

  /** [[frequentItems]] per group: one k-bounded summary per group per map
    * partition. Output: groupCols ++ (item, mg_count).
    */
  def frequentItemsPerGroup(df: DataFrame, groupCols: Seq[String],
                            item: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.functions.expressions.MisraGriesAgg(
        ColumnBridge.expression(item.cast("string")), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*).agg(agg.as("__mg"))
      .select(groupCols.map(col) :+ explode(col("__mg")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.item").as("item")
        :+ col("e.count").as("mg_count"): _*)
  }

  /** Count–Min sketch aggregate over long item ids — the frequency-probe
    * complement of [[frequentItems]]: MG names the heavy items, count-min
    * answers "how often does THIS id occur" for ANY probe after one pass.
    * Mergeable (elementwise add — the merge is exact), deterministic
    * (fixed Carter–Wegman family), so the full grid hash-compares in the
    * oracle (q214). Returns the aggregate Column (array<long>,
    * depth·width row-major).
    */
  def countMin(item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.expressions.CountMinAgg(
        ColumnBridge.expression(item.cast("long")), depth, width)
        .toAggregateExpression())
  }

  /** Point estimate from a [[countMin]] grid: min over rows of the
    * probe's counter. Never below the true count; above by at most
    * e·n/width with probability 1−e^−depth.
    */
  def countMinEstimate(cms: Column, id: Column, depth: Int, width: Int): Column = {
    val P = graft.functions.expressions.MinHashSignature.M
    val cells = graft.operators.Dedup.hashParams(depth).zipWithIndex.map {
      case ((a, b), i) =>
        element_at(cms,
          (lit(i * width) + (lit(a) * id + lit(b)) % P % width + 1).cast("int"))
    }
    if (cells.length == 1) cells.head else least(cells: _*)
  }

  def perGroupAgg(df: DataFrame, groupCols: Seq[String],
                  valueCol: Column, idCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.functions.expressions.BoundedTopKAgg(
        ColumnBridge.expression(valueCol.cast("double")),
        ColumnBridge.expression(idCol.cast("long")), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*).agg(agg.as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rn") :+
        col("col.value").as("value") :+
        col("col.id").as("id"): _*)
  }
}
