package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement probe for the co-purchase graph family (q233/q240
  * class): times each sub-step of the census so optimization targets the
  * real cost, not the guessed one. Usage: runMain graft.tools.GraphProbe <sfDir>
  */
object GraphProbe {
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
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val parts = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    time("parts distinct")(noop(parts))

    // alternative pair generation: one groupBy(ok) + local pair explode
    val edges2 = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
      .select(col("__items"), posexplode(col("__items")).as(Seq("__i", "src")))
      .select(col("src"), explode(slice(col("__items"), col("__i") + 2,
        size(col("__items")) - col("__i") - 1)).as("dst"))
    time("pairs (groupBy+explode)")(noop(edges2))
    val canon2 = edges2
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("__a"),
        greatest(col("src"), col("dst")).cast("long").as("__b"))
      .distinct()
    time("canonical2 (distinct)")(noop(canon2))
    println("[probe] canon2 rows = " + canon2.count())
    println("[probe] canon2 ckpt parts = " +
      canon2.localCheckpoint().rdd.getNumPartitions)

    val edges = parts.as("x").join(parts.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    time("pairs (self-join)")(noop(edges))

    // replicate Graphs.canonical
    val canon = time("canonical (distinct+ckpt)")(edges
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("__a"),
        greatest(col("src"), col("dst")).cast("long").as("__b"))
      .distinct()
      .localCheckpoint())
    println("[probe] canon rows = " + canon.count())
    println("[probe] canon ckpt parts = " + canon.rdd.getNumPartitions)

    val deg = canon.select(col("__a").as("__v"))
      .unionAll(canon.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    time("degrees")(noop(deg))

    val oriented = time("oriented (+ckpt)")(canon
      .join(deg.select(col("__v").as("__a"), col("__d").as("__da")), "__a")
      .join(deg.select(col("__v").as("__b"), col("__d").as("__db")), "__b")
      .select(
        when(struct(col("__da"), col("__a")) < struct(col("__db"), col("__b")),
          struct(col("__a").as("u"), col("__b").as("w")))
          .otherwise(struct(col("__b").as("u"), col("__a").as("w"))).as("__e"))
      .select(col("__e.u").as("__u"), col("__e.w").as("__w"))
      .localCheckpoint())

    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.__u") === col("e2.__u") &&
        col("e1.__w") < col("e2.__w"))
      .select(col("e1.__u").as("__u"),
        least(col("e1.__w"), col("e2.__w")).as("__a"),
        greatest(col("e1.__w"), col("e2.__w")).as("__b"))
    time("wedge join (noop)")(noop(wedges))
    println("[probe] wedge rows = " + time("wedge count")(wedges.count()))

    val triB = wedges.join(broadcast(canon), Seq("__a", "__b"), "left_semi")
      .agg(count(lit(1)).as("__tri"))
    time("wedges+bcast-semi agg")(noop(triB))
    time("wedges+bcast-semi agg(2)")(noop(triB))

    // alternative: adjacency-intersection (forward algorithm)
    val adj = oriented.groupBy(col("__u"))
      .agg(sort_array(collect_list(col("__w"))).as("__nbrs"))
      .localCheckpoint()
    val triFwd = oriented
      .join(adj, Seq("__u"))
      .withColumnRenamed("__nbrs", "__nu")
      .join(adj.withColumnRenamed("__u", "__w"), Seq("__w"), "left")
      .select(size(array_intersect(col("__nu"),
        coalesce(col("__nbrs"), array().cast("array<bigint>")))).as("__c"))
      .agg(sum(col("__c")).as("__tri"))
    time("fwd adj-intersect agg")(noop(triFwd))
    time("fwd adj-intersect agg(2)")(noop(triFwd))

    val tri = wedges.join(canon, Seq("__a", "__b"), "left_semi")
      .agg(count(lit(1)).as("__tri"))
    time("wedges+semi-join agg")(noop(tri))

    spark.stop()
  }
}
