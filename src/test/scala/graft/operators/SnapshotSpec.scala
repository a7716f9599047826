package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {

  test("diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "h1"), (2L, "h2"), (3L, "h3")).toDF("id", "fp")
    val cur = Seq((2L, "h2"), (3L, "hX"), (4L, "h4")).toDF("id", "fp")
    val got = Snapshot.diff(old, cur, "id", "fp")
      .select(col("id"), col("status")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff output carries both fingerprints for changed rows") {
    import spark.implicits._
    val old = Seq((5L, "a")).toDF("id", "fp")
    val cur = Seq((5L, "b")).toDF("id", "fp")
    val r = Snapshot.diff(old, cur, "id", "fp").collect()(0)
    assert(r.getAs[String]("old_fp") == "a" && r.getAs[String]("new_fp") == "b")
  }

  test("empty old snapshot marks everything added") {
    import spark.implicits._
    val old = Seq.empty[(Long, String)].toDF("id", "fp")
    val cur = Seq((1L, "x"), (2L, "y")).toDF("id", "fp")
    val statuses = Snapshot.diff(old, cur, "id", "fp")
      .select(col("status")).as[String].collect().toSet
    assert(statuses == Set("added"))
  }
}
