package graft.runtime

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** B1 source/sink coverage beyond parquet: CSV and JSON round-trips with
  * explicit schemas (declared-schema semantics, like every graft source),
  * plus approximate-aggregate tolerance checks (B6).
  */
class IoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip with explicit schema preserves data") {
    val docs = Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(tmp)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(tmp)
    assert(back.count() == docs.count())
    val a = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    val b = back.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("JSON-lines round-trip with explicit schema preserves data") {
    val orders = Tables.orders(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    orders.write.mode("overwrite").json(tmp)
    val back = spark.read.schema(orders.schema).json(tmp)
    assert(back.count() == orders.count())
    val a = orders.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    val b = back.agg(sum(col("o_orderkey"))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("malformed CSV rows route to a corrupt-record column (DLQ-style)") {
    val tmp = java.nio.file.Files.createTempFile("graft_bad", ".csv")
    java.nio.file.Files.writeString(tmp, "1,alpha\n2\nnot_a_number,gamma\n3,delta\n")
    val df = spark.read
      .schema("id LONG, name STRING, _corrupt_record STRING")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(tmp.toString)
    val rows = df.collect()
    val corrupt = rows.filter(!_.isNullAt(2))
    // both the short row ("2") and the type-violating row are flagged
    assert(corrupt.length == 2)
    assert(corrupt.exists(_.getString(2).startsWith("not_a_number")))
    assert(rows.count(_.isNullAt(2)) == 2) // rows 1 and 3 parse clean
  }

  test("df.stat surface: freqItems, crosstab, sampleBy run and make sense") {
    val orders = Tables.orders(spark, dir)
    val freq = orders.stat.freqItems(Array("o_orderstatus"), 0.3).collect()(0)
      .getAs[scala.collection.Seq[String]](0)
    assert(freq.contains("O") || freq.contains("F"))
    val ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    assert(ct.count() == 3) // one row per status
    val sampled = orders.stat.sampleBy("o_orderstatus",
      Map("O" -> 0.5, "F" -> 0.1, "P" -> 1.0), seed = 42L)
    assert(sampled.count() > 0 && sampled.count() < orders.count())
  }

  test("StringSerde round-trips non-ASCII utf-8 content") {
    import graft.serde.StringSerde
    import spark.implicits._
    val s = "héllo wörld — 你好 🚀"
    val back = Seq(s).toDF("s")
      .select(StringSerde.deserialize(StringSerde.serialize(col("s"))).as("s"))
      .as[String].collect()(0)
    assert(back == s)
  }

  test("observe() exposes pipeline metrics without a second pass") {
    val obs = new org.apache.spark.sql.Observation("pipeline_metrics")
    Tables.lineitem(spark, dir)
      .observe(obs, count(lit(1)).as("rows"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("high_discount"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] == 6000L)
    assert(m("high_discount").asInstanceOf[Long] > 0L)
  }

  test("approx_count_distinct within 5% of exact at default rsd") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx within 2% of exact percentile") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).collect()(0).getDouble(0)
    val approx = li.select(expr("percentile_approx(l_extendedprice, 0.5, 10000)"))
      .collect()(0).getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("HLL sketches merge to the same estimate as a direct global sketch") {
    val o = Tables.orders(spark, dir)
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    // Per-group sketches union-merged == one global sketch (mergeability),
    // and both land within 5% of exact.
    val merged = o.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    val direct = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .collect()(0).getLong(0)
    assert(merged == direct, s"merge-invariance: $merged != $direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"est=$merged exact=$exact")
  }
}
