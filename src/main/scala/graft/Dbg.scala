package graft

import org.apache.spark.sql.SparkSession

/** Throwaway debug main for schema/plan inspection during development. */
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.orderBy("event_id").show(3, false)
    spark.stop()
  }
}
