package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion: the two-phase global rank must equal the window
  * row_number it decomposes, bucketWidth must be a pure decomposition
  * knob, and the Borda sum must fuse hand-checkably.
  */
class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 50L, 10L), (2L, 50L, 90L), (3L, -20L, 40L),
    (4L, 999L, -5L), (5L, 0L, 40L), (6L, 7L, 7L))
    .toDF("id", "s1", "s2")

  test("globalRank equals the window row_number it decomposes") {
    val w = Window.orderBy($"s1".desc, $"id".asc)
    val expected = df.withColumn("rank", row_number().over(w).cast("long"))
      .select($"id", $"rank").orderBy($"id").collect().toSeq
    for (bw <- Seq(1L, 10L, 1000L)) {
      val got = RankFusion.globalRank(df, "id", "s1", bw)
        .orderBy($"id").collect().toSeq
      assert(got == expected, s"bucketWidth=$bw")
    }
  }

  test("borda sums per-scorer ranks and ranks the sum") {
    val got = RankFusion.borda(df, "id", Seq("s1", "s2"), bucketWidth = 10L)
      .orderBy($"id").collect()
    // hand-computed: s1 desc -> 4,1,2,6,5,3 ; s2 desc -> 2,3,5,1,6,4
    val r1 = Map(4L -> 1L, 1L -> 2L, 2L -> 3L, 6L -> 4L, 5L -> 5L, 3L -> 6L)
    val r2 = Map(2L -> 1L, 3L -> 2L, 5L -> 3L, 1L -> 4L, 6L -> 5L, 4L -> 6L)
    got.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("rank_s1") == r1(id), s"id=$id")
      assert(r.getAs[Long]("rank_s2") == r2(id), s"id=$id")
      assert(r.getAs[Long]("borda") == r1(id) + r2(id))
    }
    // fused: borda asc, ties id asc — 2:(3+1)=4, 1:(2+4)=6, 4:(1+6)=7,
    // 3:(6+2)=8, 5:(5+3)=8, 6:(4+5)=9 -> 2,1,4,3,5,6
    val fused = got.map(r => r.getAs[Long]("id") -> r.getAs[Long]("fused_rank")).toMap
    assert(fused == Map(2L -> 1L, 1L -> 2L, 4L -> 3L, 3L -> 4L, 5L -> 5L, 6L -> 6L))
  }

  test("repartition does not change the fusion") {
    val a = RankFusion.borda(df, "id", Seq("s1", "s2"))
      .orderBy($"id").collect().toSeq
    val b = RankFusion.borda(df.repartition(5, $"s2"), "id", Seq("s1", "s2"))
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }
}
