package graft.tools

import org.apache.spark.sql.SparkSession

/** Local plan-inspection utility: prints exchange-reuse and scan counts
  * (and optionally the full physical plan) for one SparkEntry query.
  * Usage: runMain graft.tools.ExplainProbe <queryName> <sfDir> [full]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    // Execute THIS queryExecution first (collect, not a write — a write
    // spawns its own QueryExecution): under AQE, exchange reuse only
    // appears in the finalized adaptive plan.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(plan).length)
    println("PARQUET_SCAN_COUNT=" + "Scan parquet".r.findAllIn(plan).length)
    if (args.length > 2 && args(2) == "full") println(plan)
    spark.stop()
  }
}
