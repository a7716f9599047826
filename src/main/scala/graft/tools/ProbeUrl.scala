package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeUrl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"$tag: " + (System.nanoTime()-t0)/1e9)
    }
    val q = graft.SparkEntry.queries("q148_domain_quota")
    time("q148 run1")(q(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
    time("q148 run2")(q(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
    val plan = q(spark, "/root/testdata/sf0.1").queryExecution.executedPlan
    println("plan tree string length: " + plan.toString.length)
    spark.stop()
  }
}
