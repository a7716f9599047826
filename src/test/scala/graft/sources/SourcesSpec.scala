package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_src_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv: declared schema, good/bad routing off one scan") {
    val dir = tmpDir("csv")
    Files.write(Paths.get(dir, "a.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,0.75\nnot_a_long,gamma,xyz\n3,delta,1.0\n".getBytes)
    val r = Readers.csv(spark, dir, schema)
    val good = r.good.orderBy("id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(good.map(_.getString(1)).toSeq == Seq("alpha", "beta", "delta"))
    val bad = r.bad.collect()
    assert(bad.length == 1 && bad(0).getAs[String](Readers.CorruptCol).contains("not_a_long"))
    // the corrupt-column-only pruning restriction of old Spark does not
    // bite: counting the dead-letter side works directly
    assert(r.bad.count() == 1 && r.good.count() == 3)
  }

  test("json-lines: declared schema, corrupt rows carry the raw record") {
    val dir = tmpDir("json")
    Files.write(Paths.get(dir, "a.jsonl"),
      """{"id": 1, "name": "x", "score": 0.1}
        |{"id": "oops", "name": 7
        |{"id": 2, "name": "y", "score": 0.2}
        |""".stripMargin.getBytes)
    val r = Readers.jsonLines(spark, dir, schema)
    assert(r.good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val bad = r.bad.collect()
    assert(bad.length == 1)
    assert(bad(0).getAs[String](Readers.CorruptCol).startsWith("""{"id": "oops""""))
  }

  test("strict mode fails fast on malformed rows") {
    val dir = tmpDir("strict")
    Files.write(Paths.get(dir, "a.csv"), "id,name,score\nbad_row_no_commas\n".getBytes)
    intercept[Exception] {
      Readers.csv(spark, dir, schema, strict = true).good.collect()
    }
  }

  test("parquet: expected-schema verification catches silent evolution") {
    val dir = tmpDir("pq") + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir)
    // matching expectation passes
    Readers.parquet(spark, dir, Some(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))).collect()
    // missing column or wrong type fails at plan time
    intercept[IllegalArgumentException] {
      Readers.parquet(spark, dir, Some(StructType(Seq(
        StructField("id", LongType), StructField("score", DoubleType)))))
    }
    intercept[IllegalArgumentException] {
      Readers.parquet(spark, dir, Some(StructType(Seq(
        StructField("id", StringType)))))
    }
  }

  test("orc: round-trips a parquet table byte-identically, verifies schema") {
    val dir = tmpDir("orc") + "/t"
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    src.write.orc(dir)
    val back = Readers.orc(spark, dir,
      Some(src.schema)).orderBy("r_regionkey").collect()
    assert(back.toSeq == src.orderBy("r_regionkey").collect().toSeq)
    intercept[IllegalArgumentException] {
      Readers.orc(spark, dir, Some(StructType(Seq(
        StructField("missing_col", LongType)))))
    }
  }

  test("binaryFiles: size guard routes oversized blobs before any decode") {
    val dir = tmpDir("bin")
    Files.write(Paths.get(dir, "small.bin"), Array.fill[Byte](128)(1))
    Files.write(Paths.get(dir, "large.bin"), Array.fill[Byte](4096)(2))
    val r = Readers.binaryFiles(spark, dir, pathGlob = "*.bin", maxBytes = 1024)
    val good = r.good.select("path", "length").collect()
    assert(good.length == 1 && good(0).getString(0).endsWith("small.bin"))
    val bad = r.bad.collect()
    assert(bad.length == 1 && bad(0).getAs[Long]("length") == 4096L)
    assert(!r.bad.columns.contains("content"), "bad side must not carry payloads")
  }

  test("textLines + conforming: raw ingest into a declared projection") {
    val dir = tmpDir("txt")
    Files.write(Paths.get(dir, "docs.txt"), "hello world\nsecond line\n".getBytes)
    val lines = Readers.textLines(spark, dir)
    assert(lines.as[String].collect().sorted.toSeq == Seq("hello world", "second line"))
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("id", "name")
    val conf = Readers.conforming(df, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))))
    val rows = conf.collect().map(r => (r.isNullAt(0), r.getBoolean(2)))
    assert(rows.toSet == Set((false, true), (true, false)))
  }

  test("avroContainer: multi-record container files decode under the declared schema") {
    import org.apache.avro.{Schema => AvroSchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val writerJson =
      """{"type":"record","name":"t","fields":[
         {"name":"s","type":"string"},{"name":"n","type":"long"},
         {"name":"extra","type":"double"}]}"""
    val readerJson =
      """{"type":"record","name":"t","fields":[
         {"name":"s","type":"string"},{"name":"n","type":"long"},
         {"name":"added","type":"long","default":7}]}"""
    val ws = new AvroSchema.Parser().parse(writerJson)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toFile
    for (f <- 0 until 2) {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](ws))
      w.create(ws, new java.io.File(dir, s"part$f.avro"))
      for (i <- 0 until 3) {
        val rec = new GenericData.Record(ws)
        rec.put("s", s"r${f}_$i"); rec.put("n", (f * 10 + i).toLong)
        rec.put("extra", i * 0.5)
        w.append(rec)
      }
      w.close()
    }
    // declared READER schema: drops `extra`, fills defaulted `added` —
    // standard Avro resolution across producer schema evolution
    val got = Readers.avroContainer(spark, dir.getAbsolutePath, readerJson,
        pathGlob = "*.avro")
      .collect().map(r => (r.getAs[String]("s"), r.getAs[Long]("n"),
        r.getAs[Long]("added"))).toSet
    assert(got == (for (f <- 0 until 2; i <- 0 until 3)
      yield (s"r${f}_$i", (f * 10 + i).toLong, 7L)).toSet)
    assert(got.size == 6)
  }
}
