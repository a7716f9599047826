package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: canonical-build vs LPA-iteration cost for the two
  * co-purchase pair-generation variants. runMain graft.tools.LpaProbe <sfDir>
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def edgesOld: DataFrame = {
      val parts = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      parts.as("x").join(parts.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    }
    def edgesNew: DataFrame = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
      .select(col("__items"), posexplode(col("__items")).as(Seq("__i", "src")))
      .select(col("src"), explode(slice(col("__items"), col("__i") + 2,
        size(col("__items")) - col("__i") - 1)).as("dst"))

    def canonical(edges: DataFrame): DataFrame = edges
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("__a"),
        greatest(col("src"), col("dst")).cast("long").as("__b"))
      .distinct()
      .localCheckpoint()

    def lpa(canon: DataFrame): Unit = {
      var labels = canon.select(col("__a").as("__v"))
        .unionAll(canon.select(col("__b").as("__v")))
        .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
        .select(col("__v"), col("__v").as("__l"))
        .localCheckpoint()
      for (_ <- 1 to 3) {
        labels = canon
          .join(labels.select(col("__v").as("__a"), col("__l").as("__la")), "__a")
          .join(labels.select(col("__v").as("__b"), col("__l").as("__lb")), "__b")
          .select(explode(array(
            struct(col("__a").as("v"), col("__lb").as("l")),
            struct(col("__b").as("v"), col("__la").as("l")))).as("__e"))
          .select(col("__e.v").as("__v"), col("__e.l").as("__l"))
          .groupBy(col("__v"), col("__l")).agg(count(lit(1)).as("__c"))
          .groupBy(col("__v"))
          .agg(max(struct(col("__c"), (-col("__l")).as("__nl"))).as("__w"))
          .select(col("__v"), (-col("__w.__nl")).as("__l"))
          .localCheckpoint()
      }
      labels.write.format("noop").mode("overwrite").save()
    }

    def lpaPlan(canon: DataFrame, tag: String): Unit = {
      val labels0 = canon.select(col("__a").as("__v"))
        .unionAll(canon.select(col("__b").as("__v")))
        .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
        .select(col("__v"), col("__v").as("__l"))
        .localCheckpoint()
      val it1 = canon
        .join(labels0.select(col("__v").as("__a"), col("__l").as("__la")), "__a")
        .join(labels0.select(col("__v").as("__b"), col("__l").as("__lb")), "__b")
        .select(explode(array(
          struct(col("__a").as("v"), col("__lb").as("l")),
          struct(col("__b").as("v"), col("__la").as("l")))).as("__e"))
        .select(col("__e.v").as("__v"), col("__e.l").as("__l"))
        .groupBy(col("__v"), col("__l")).agg(count(lit(1)).as("__c"))
        .groupBy(col("__v"))
        .agg(max(struct(col("__c"), (-col("__l")).as("__nl"))).as("__w"))
        .select(col("__v"), (-col("__w.__nl")).as("__l"))
      it1.write.format("noop").mode("overwrite").save()
      println(s"===== plan $tag =====")
      println(it1.queryExecution.executedPlan.toString.linesIterator.take(60).mkString("\n"))
      println(s"[probe] $tag canon parts=" + canon.rdd.getNumPartitions +
        " schema=" + canon.schema.map(f => f.name + ":" + f.nullable).mkString(","))
    }

    lpaPlan(canonical(edgesNew), "new")
    lpaPlan(canonical(edgesOld), "old")
    for (round <- 1 to 0) {
      val cN = time(s"r$round canonical(new)")(canonical(edgesNew))
      time(s"r$round lpa(new)")(lpa(cN))
      System.gc()
      val cO = time(s"r$round canonical(old)")(canonical(edgesOld))
      time(s"r$round lpa(old)")(lpa(cO))
      System.gc()
    }
    spark.stop()
  }
}
