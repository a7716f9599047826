package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine expression is bitwise-identical to the HOF formulation") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(emb.select((col("vec_id") + 1).as("id_a"), col("embedding").as("vb")), "id_a")
    val diff = pairs.select(
        VectorFunctions.cosine(col("va"), col("vb")).as("fast"),
        VectorFunctions.cosineViaHof(col("va"), col("vb")).as("hof"))
      .filter(col("fast") =!= col("hof")) // exact double compare
      .count()
    assert(diff == 0L, "fused-loop and HOF folds must agree bitwise")
  }

  test("native l2DistanceSq is bitwise-identical to the HOF formulation") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(emb.select((col("vec_id") + 1).as("id_a"), col("embedding").as("vb")), "id_a")
    val diff = pairs.select(
        VectorFunctions.l2DistanceSq(col("va"), col("vb")).as("fast"),
        VectorFunctions.l2DistanceSqViaHof(col("va"), col("vb")).as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diff == 0L, "fused-loop and HOF folds must agree bitwise")
    // edge semantics match cosine: mismatch -> null, mixed types fine
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.l2DistanceSq(col("a"), col("b"))).collect()(0)
    assert(mismatch.isNullAt(0))
    val mixed = Seq((Array(3.0, 4.0), Array(0.0f, 0.0f))).toDF("a", "b")
      .select(VectorFunctions.l2DistanceSq(col("a"), col("b"))).as[Double].collect()(0)
    assert(mixed == 25.0)
  }

  test("native cosine handles nulls, length mismatch, zero norms") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val vals = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(vals(0) - 1.0) < 1e-15)
    assert(vals(1) == 0.0)
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).collect()(0)
    assert(mismatch.isNullAt(0))
    val withNull = Seq((null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("native cosine: non-nullable children + length mismatch stays in codegen") {
    // Literal arrays are non-nullable children; without the nullable=true
    // override the mismatch branch generates `false = true;` (Janino error)
    // and codegen silently falls back to interpreted eval returning null
    // from a declared-non-nullable expression.
    val df = spark.range(1).select(
      VectorFunctions.cosine(
        array(lit(1.0), lit(2.0)), array(lit(1.0))).as("c"))
    assert(df.schema("c").nullable, "mismatch can null a non-nullable-child input")
    val row = df.collect()(0)
    assert(row.isNullAt(0))
    // matching lengths on the same non-nullable shape still computes
    val ok = spark.range(1).select(
      VectorFunctions.cosine(
        array(lit(3.0), lit(4.0)), array(lit(4.0), lit(3.0)))).as[Double].collect()(0)
    assert(math.abs(ok - 24.0 / 25.0) < 1e-15)
  }

  test("native cosine works on double arrays and mixed float/double") {
    val df = Seq((Array(3.0, 4.0), Array(4.0f, 3.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()(0)
    assert(math.abs(c - 24.0 / 25.0) < 1e-15)
  }

  test("fixed-point vector sum matches the posexplode+round formulation bitwise") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val native = emb.groupBy(col("label"))
      .agg(VectorFunctions.vectorSumFixed(col("embedding"), 1L << 30).as("fx"))
      .select(col("label"), col("fx.n").as("n"),
        posexplode(col("fx.sums")).as(Seq("dim", "s")))
      .select(col("label"), col("dim").cast("long").as("dim"), col("s"), col("n"))
    val exploded = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(round(col("x").cast("double") * (1L << 30)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("s"), col("n"))
    assert(native.exceptAll(exploded).isEmpty && exploded.exceptAll(native).isEmpty,
      "native buffer sums must equal the relational fixed-point sums")
    // Negative halves round away from zero (SQL round), not toward +inf.
    val neg = Seq(Tuple1(Array(-2.5f, 2.5f)), Tuple1(Array(-1.0f, 1.0f)))
      .toDF("v")
      .agg(VectorFunctions.vectorSumFixed(col("v"), 1L).as("fx"))
      .select(col("fx.sums")).as[Seq[Long]].collect()(0)
    assert(neg == Seq(-4L, 4L), s"half-away rounding expected, got $neg")
    // Dimensionality mismatch fails loudly, not silently truncates.
    val err = intercept[Exception] {
      Seq(Tuple1(Array(1.0f)), Tuple1(Array(1.0f, 2.0f))).toDF("v")
        .coalesce(1)
        .agg(VectorFunctions.vectorSumFixed(col("v"), 1L)).collect()
    }
    assert(err.getMessage != null)
  }

  test("int8Quantize: max-abs scale, [-127,127] codes, zero-vector guard") {
    val rows = Seq(
      Tuple1(Array(0.5f, -0.5f, 0.25f)), // scale 0.5 -> codes 127, -127, 64
      Tuple1(Array(0.0f, 0.0f, 0.0f))    // all-zero -> scale 0, codes 0
    ).toDF("v")
      .select(VectorFunctions.int8Quantize(col("v")).as("q"))
      .select(col("q").getField("qscale").as("m"), col("q").getField("q").as("codes"))
      .collect()
    assert(rows(0).getAs[Double]("m") == 0.5)
    // floor(0.25*127/0.5 + 0.5) = floor(64.0) = 64 (0.25/0.5 exact in binary)
    assert(rows(0).getSeq[Long](1) == Seq(127L, -127L, 64L))
    assert(rows(1).getAs[Double]("m") == 0.0)
    assert(rows(1).getSeq[Long](1) == Seq(0L, 0L, 0L))
  }

  test("native Int8Quantize matches the HOF reference bitwise") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(200)(Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)) ++
      Seq(Array.fill(16)(0.0f), Array[Float](), Array(-1e-8f, 1e-8f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val mism = df.select(
        VectorFunctions.int8Quantize(col("v")).as("n"),
        VectorFunctions.int8QuantizeViaHof(col("v")).as("h"))
      .where(col("n.qscale") =!= col("h.qscale") || col("n.q") =!= col("h.q"))
      .count()
    assert(mism === 0L)
  }

  test("native ScaleVector matches the HOF transform bitwise") {
    import graft.operators.Clustering
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(200)(Array.fill(16)((rnd.nextFloat() - 0.5f) * 8f)) ++
      Seq(Array.fill(16)(0.0f), Array[Float](), Array(-0.0005f, 0.0005f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    for (scale <- Seq(1L, 1000L, 1L << 30)) {
      val mism = df.select(
          Clustering.scaleVector(col("v"), scale).as("n"),
          Clustering.scaleVectorViaHof(col("v"), scale).as("h"))
        .where(col("n") =!= col("h")).count()
      assert(mism === 0L, s"scale=$scale")
    }
    // long arrays (the projected-space scale=1 path) and null elements
    val lv = Seq(Tuple1(Array(1L, -7L, 1L << 55)),
      Tuple1(Array[Long]())).toDF("v")
    val lm = lv.select(Clustering.scaleVector(col("v"), 1L).as("n"),
        Clustering.scaleVectorViaHof(col("v"), 1L).as("h"))
      .where(col("n") =!= col("h")).count()
    assert(lm === 0L)
    val withNull = Seq(Tuple1(Seq[Option[Double]](Some(1.5), None, Some(-2.5))))
      .toDF("v")
    val r = withNull.select(Clustering.scaleVector(col("v"), 1000L).as("n"))
      .collect()(0).getSeq[Any](0)
    assert(r == Seq(1500L, null, -2500L))
  }
}
