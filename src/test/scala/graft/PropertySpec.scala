package graft

import graft.operators.Dedup
import graft.serde.{AvroSerde, PbField, PbType, ProtobufSerde}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.2-4) using ScalaCheck generators with
  * a fixed seed, batched into single Spark jobs: serde round-trips over
  * random payloads, dedup idempotence, minhash order-independence.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiStr = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  test("property: protobuf serde round-trips random (string, long, bool) records") {
    val recs = samples(Gen.zip(asciiStr, Gen.long, Gen.oneOf(true, false)), 50)
    val serde = ProtobufSerde(Seq(
      PbField(1, "s", PbType.PbString),
      PbField(2, "n", PbType.PbInt64),
      PbField(3, "b", PbType.PbBool)))
    val out = recs.toDF("s", "n", "b")
      .select(col("s"), col("n"), col("b"),
        serde.deserialize(serde.serialize(struct(col("s"), col("n"), col("b")))).as("v"))
      .collect()
    out.foreach { r =>
      val v = r.getAs[Row]("v")
      assert(v.getAs[String]("s") == r.getAs[String]("s"))
      assert(v.getAs[Long]("n") == r.getAs[Long]("n"))
      assert(v.getAs[Boolean]("b") == r.getAs[Boolean]("b"))
    }
    assert(out.length == 50)
  }

  test("property: avro serde round-trips random (string, long, double) records") {
    val schema =
      """{"type":"record","name":"t","fields":[
         {"name":"s","type":"string"},{"name":"n","type":"long"},
         {"name":"d","type":"double"}]}"""
    val serde = AvroSerde(schema)
    val recs = samples(Gen.zip(asciiStr, Gen.long, Gen.double), 50)
    val out = recs.toDF("s", "n", "d")
      .select(col("s"), col("n"), col("d"),
        serde.deserialize(serde.serialize(struct(col("s"), col("n"), col("d")))).as("v"))
      .collect()
    out.foreach { r =>
      val v = r.getAs[Row]("v")
      assert(v.getAs[String]("s") == r.getAs[String]("s"))
      assert(v.getAs[Long]("n") == r.getAs[Long]("n"))
      val d0 = r.getAs[Double]("d"); val d1 = v.getAs[Double]("d")
      assert(d1 == d0 || (d0.isNaN && d1.isNaN))
    }
    assert(out.length == 50)
  }

  test("property: keepFirst is idempotent and input-order independent") {
    val pairs = samples(Gen.zip(Gen.choose(1L, 5L), Gen.choose(1L, 10L)), 40)
    val order = Seq(col("seq").asc, col("tag").asc)
    val df = pairs.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
      .toDF("k", "seq", "tag")
    val once = Dedup.keepFirst(df, Seq("k"), order)
    val twice = Dedup.keepFirst(once, Seq("k"), order)
    val shuffled = Dedup.keepFirst(
      scala.util.Random.shuffle(pairs.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) })
        .toDF("k", "seq", "tag"), Seq("k"), order)
    val a = once.as[(Long, Long, Long)].collect().toSet
    assert(a == twice.as[(Long, Long, Long)].collect().toSet, "idempotent")
    assert(a == shuffled.as[(Long, Long, Long)].collect().toSet, "order independent")
    assert(a.map(_._1).size == a.size, "one row per key")
  }

  test("property: minhash signatures independent of corpus row order") {
    val docsTokens = samples(
      Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f")), 8)
    val docs = docsTokens.zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    def sigs(rows: Seq[(Long, String)]) =
      Dedup.minhashSignatures(
        Dedup.shingleIds(rows.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sigs(docs) == sigs(docs.reverse))
  }
}
