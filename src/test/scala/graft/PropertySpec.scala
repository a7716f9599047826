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

  test("property: native and UDF wire decoders agree on arbitrary bytes") {
    // fuzz parity: over random byte blobs (mostly malformed, some
    // accidentally valid prefixes) the codegen decoders must agree with
    // their interpreted references EXACTLY — same nulls, same values.
    val blobs = samples(Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)), 80)
    val pb = ProtobufSerde(Seq(
      PbField(1, "s", PbType.PbString),
      PbField(2, "n", PbType.PbInt64),
      PbField(3, "r", PbType.PbInt32, repeated = true)))
    val avro = AvroSerde(
      """{"type":"record","name":"t","fields":[
         {"name":"s","type":"string"},{"name":"n","type":"long"}]}""")
    val df = blobs.map(Tuple1(_)).toDF("raw")
      .select(
        pb.deserialize(col("raw")).as("pn"),
        pb.deserializeUdf(col("raw")).as("pu"),
        avro.deserialize(col("raw")).as("an"),
        avro.deserializeUdf(col("raw")).as("au"))
      .collect()
    df.zip(blobs).foreach { case (r, blob) =>
      assert(r.get(0) == r.get(1),
        s"pb native ${r.get(0)} vs udf ${r.get(1)} on ${blob.toSeq}")
      assert(r.get(2) == r.get(3),
        s"avro native ${r.get(2)} vs udf ${r.get(3)} on ${blob.toSeq}")
    }
    assert(df.length == 80)
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

  test("property: custom as-of exec == composed as-of on random event sets") {
    import graft.operators.Joins
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    for (seedOff <- 0 until 3) {
      val rows = samples(gen, 1).head.distinct
      val sec = rows.map { case (k, s) =>
        (k, new java.sql.Timestamp(1700000000000L + s * 1000)) }
      val (lSide, rSide) = sec.splitAt(sec.length / 2)
      if (lSide.nonEmpty && rSide.nonEmpty) {
        // right must be unique per (key, ts) for deterministic payloads
        val rUnique = rSide.distinct.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong + seedOff) }
          .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
        val l = lSide.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
        val r = rUnique.toDF("k", "rt", "payload")
        val composed = Joins.asof(l, r, Seq("k"), "t", "rt", Seq("payload"))
          .select("lid", "asof_payload").collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
        val custom = Joins.asofMerge(l, r, Seq("k"), "t", "rt")
          .select("lid", "asof_payload").collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
        assert(custom == composed, s"seedOff=$seedOff")
      }
    }
  }

  test("property: custom range exec == composed range join on random event sets") {
    import graft.operators.Joins
    import org.apache.spark.sql.functions.expr
    val gen = Gen.listOfN(50, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    for (seedOff <- 0 until 3) {
      val rows = samples(gen, 1).head.distinct.zipWithIndex
        .map { case ((k, s), i) =>
          (k, new java.sql.Timestamp(1700000000000L + s * 1000), i.toLong + seedOff) }
      val l = rows.toDF("k", "t", "lid")
      val r = rows.map { case (k, t, i) => (k, t, i + 1000) }.toDF("k", "rt", "rid")
      val composed = Joins.rangeJoin(l, r, Seq("k"), "t", "rt",
          expr("INTERVAL '0' SECOND"), expr("INTERVAL '10' SECOND"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val custom = Joins.rangeJoinMerge(l, r, Seq("k"), "t", "rt",
          0L, 10L * 1000000)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(custom == composed, s"seedOff=$seedOff diff=${
        (custom diff composed) ++ (composed diff custom)}")
    }
  }

  test("custom execs support multi-column keys") {
    import graft.operators.Joins
    val l = Seq((1L, "a", ts2("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts2("2024-01-01 10:00:00"), 2L),
      (2L, "a", ts2("2024-01-01 10:00:00"), 3L))
      .toDF("k1", "k2", "t", "lid")
    val r = Seq((1L, "a", ts2("2024-01-01 09:00:00"), 10L),
      (1L, "b", ts2("2024-01-01 09:30:00"), 20L),
      (2L, "b", ts2("2024-01-01 09:00:00"), 30L))
      .toDF("k1", "k2", "rt", "pay")
    val asof = Joins.asofMerge(l, r, Seq("k1", "k2"), "t", "rt")
      .select("lid", "asof_pay").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(asof == Map(1L -> 10L, 2L -> 20L, 3L -> -1L))
    val range = Joins.rangeJoinMerge(l, r, Seq("k1", "k2"), "t", "rt",
        -2L * 3600 * 1000000, 1L)
      .select("lid", "pay").as[(Long, Long)].collect().toSet
    assert(range == Set((1L, 10L), (2L, 20L)))
  }

  private def ts2(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

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

  // ---- native byte-level kernels vs independent JVM-string references ----

  private val M = Dedup.M
  private val P = Dedup.P
  private val hp = Dedup.hashParams(16)

  private def refPoly(s: String, seed: Long = 0L): Long =
    s.codePoints().toArray.foldLeft(seed)((acc, c) => (acc * 31 + c) % M)

  /** Shingles under Spark split(text, " ") semantics (Java split with
    * limit -1): trailing empty tokens KEPT — the contract the kernels,
    * the batch paths, and the DuckDB oracle all share.
    */
  private def refShingles(s: String, k: Int): Seq[String] = {
    val toks = s.split(" ", -1)
    if (toks.length < k) Seq.empty
    else toks.sliding(k).map(_.mkString(" ")).toSeq
  }

  private def refSignature(s: String, n: Int, k: Int): Option[Seq[Long]] = {
    val tids = refShingles(s, k).map(refPoly(_))
    if (tids.isEmpty) None
    else Some((0 until n).map(j => tids.map(t => (t * hp(j)._1 + hp(j)._2) % P).min))
  }

  private def refSimhash(s: String, nBits: Int, k: Int): Option[Long] = {
    val tids = refShingles(s, k).map(refPoly(_)).distinct
    if (tids.isEmpty) None
    else Some((0 until nBits).map { j =>
      val vote = tids.map(t => ((t * hp(j)._1 + hp(j)._2) % P % 2L) * 2L - 1L).sum
      if (vote > 0) 1L << j else 0L
    }.sum)
  }

  /** Random docs with multibyte code points (2-, 3-, 4-byte incl. a
    * surrogate pair), empty tokens from doubled spaces, and trailing
    * spaces — every split/UTF-8 edge the byte kernels hand-roll.
    */
  private val docGen: Gen[String] = {
    val atom = Gen.oneOf("a", "z", "Q", "9", "é", "ß", "中", "λ", "𝄞")
    val word = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    for {
      nWords <- Gen.choose(0, 12)
      words <- Gen.listOfN(nWords, word)
      seps <- Gen.listOfN(math.max(nWords - 1, 0), Gen.oneOf(" ", "  "))
      trail <- Gen.oneOf("", " ", "  ")
    } yield words.zipAll(seps, "", "").flatMap(p => Seq(p._1, p._2)).mkString + trail
  }

  test("property: winnowing fingerprints match a string-level reference") {
    val k = 3; val w = 4
    def refWinnow(s: String): Set[Long] = {
      val toks = s.split(" ", -1)
      if (toks.length < k) Set.empty
      else {
        val hashes = toks.sliding(k).map(g => refPoly(g.mkString(" "))).toArray
        if (hashes.length < w) Set.empty
        else hashes.sliding(w).map(_.min).toSet
      }
    }
    val docs = samples(docGen, 80).distinct.zipWithIndex.map(_.swap)
    val df = docs.map { case (i, t) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
    docs.foreach { case (i, t) =>
      assert(got.getOrElse(i.toLong, Set.empty[Long]) == refWinnow(t),
        s"mismatch for doc $i: '${t.take(60)}'")
    }
  }

  test("property: native MinHashSignature matches a string-level reference") {
    val docs = samples(docGen, 120).distinct.zipWithIndex.map(_.swap)
    val got = docs.map { case (i, t) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), Dedup.minhashSignatureCol(col("text")).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toIndexedSeq)))
      .toMap
    docs.foreach { case (i, t) =>
      assert(got(i.toLong) == refSignature(t, 8, 3).map(_.toIndexedSeq),
        s"mismatch for doc $i: '${t.take(60)}'")
    }
  }

  test("property: native SimHash matches a string-level reference") {
    val docs = samples(docGen, 120).distinct.zipWithIndex.map(_.swap)
    val got = docs.map { case (i, t) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), Dedup.simhashCol(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    docs.foreach { case (i, t) =>
      assert(got(i.toLong) == refSimhash(t, 16, 3),
        s"mismatch for doc $i: '${t.take(60)}'")
    }
  }

  test("property: native CleanTokens matches a split-level reference") {
    // Stopwords drawn from the atom alphabet so removal actually fires;
    // docGen's double/trailing spaces exercise empty-token semantics
    // (Spark split limit -1: empties are ordinary tokens) and the
    // multi-byte atoms exercise the UTF-8 byte-span comparisons.
    val stops = Seq("a", "9", "中")
    def refClean(s: String): (String, Int) = {
      val ns = s.split(" ", -1).filterNot(stops.contains)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      ns.foreach(t => if (out.isEmpty || out.last != t) out += t)
      (out.mkString(" "), out.length)
    }
    val docs = samples(docGen, 150).distinct.zipWithIndex.map(_.swap)
    val got = docs.map { case (i, t) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"),
        graft.functions.TextFunctions.cleanTokens(col("text"), stops).as("c"),
        graft.functions.TextFunctions.cleanTokensCount(col("text"), stops).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    docs.foreach { case (i, t) =>
      assert(got(i.toLong) == refClean(t),
        s"mismatch for doc $i: '${t.take(60)}' got ${got(i.toLong)} want ${refClean(t)}")
    }
  }

  test("property: native PolyHash matches the code-point fold on random strings") {
    val strs = samples(docGen, 120).distinct
    val got = strs.toDF("s")
      .select(col("s"), Dedup.polyHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach(s => assert(got(s) == refPoly(s), s"mismatch for '${s.take(60)}'"))
  }

  test("property: packing offsets are exact prefix sums and bins tile exactly") {
    val ns = samples(Gen.choose(0L, 500L), 40)
    val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val cap = 256L
    val pos = graft.operators.Packing
      .packPositions(df, "doc_id", "n", cap, bucketWidth = 7L)
      .orderBy("doc_id").collect()
    val refStarts = ns.scanLeft(0L)(_ + _).init
    assert(pos.map(_.getAs[Long]("start_off")).toSeq == refStarts)
    val bins = graft.operators.Packing.packBins(df, "doc_id", "n", cap, 7L)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("n_tokens")).sum == ns.sum)
    val fills = bins.map(_.getAs[Long]("n_tokens")).toSeq
    assert(fills.init.forall(_ == cap), s"non-final bin underfilled: $fills")
  }

  test("property: CDC chunks match a string-level reference and tile the doc") {
    val docs = samples(docGen, 60).distinct // multi-byte + empty-token edges
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df, "doc_id", "text", w = 3, divisor = 4L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("chunk_hash"))).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ", -1)
      // boundary AFTER 1-based position p iff the 3-token window ending
      // at p hashes to 0 mod 4
      val bounds = (1 to toks.length).map { p =>
        if (p >= 3 && refPoly(toks.slice(p - 3, p).mkString(" ")) % 4 == 0) 1 else 0
      }
      var cum = 0
      val chunkOf = (1 to toks.length).map { j =>
        val c = cum; cum += bounds(j - 1); c
      }
      val ref = toks.zipWithIndex
        .groupBy { case (_, idx0) => chunkOf(idx0).toLong }
      ref.foreach { case (cid, members) =>
        val chunkStr = members.sortBy(_._2).map(_._1).mkString(" ")
        val (nTok, h) = got((i.toLong, cid))
        assert(nTok == members.length, s"doc $i chunk $cid size")
        assert(h == refPoly(chunkStr), s"doc $i chunk $cid hash for '$chunkStr'")
      }
      // chunks tile: ids 0..max contiguous, sizes sum to token count
      val sizes = ref.values.map(_.length).sum
      assert(sizes == toks.length)
    }
  }

  test("property: fixed-point k-means is partitioning-invariant on random vectors") {
    val vecs = samples(Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 250.0f)), 30)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val a = graft.operators.Clustering.kmeansFixed(df, "id", "vec", k = 3, iters = 3)
      .orderBy("id").collect().toSeq
    val b = graft.operators.Clustering
      .kmeansFixed(df.repartition(13), "id", "vec", k = 3, iters = 3)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("property: span corruption partitions every random document exactly") {
    // Non-sentinel tokens of input ++ target reconstruct the original
    // document's token multiset, and sentinels come out 0..n_spans-1 in
    // both sequences.
    val docGen = Gen.listOfN(40, Gen.oneOf("a", "b", "cc", "ddd", "e"))
      .map(_.mkString(" "))
    val docs = samples(docGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = graft.operators.SpanCorrupt
      .corrupt(docs.toDF("doc_id", "text"), "doc_id", "text", maskPct = 35)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    docs.foreach { case (id, text) =>
      val r = out(id)
      val inT = r.getString(4).split(" ").filter(_.nonEmpty)
      val tgT = r.getString(5).split(" ").filter(_.nonEmpty)
      val plain = (inT ++ tgT).filterNot(t => sentinel.matches(t))
      assert(plain.sorted.toSeq == text.split(" ").sorted.toSeq,
        s"doc $id tokens not partitioned")
      def sentinelIds(ts: Array[String]) =
        ts.collect { case sentinel(k) => k.toLong }.toSeq
      val n = r.getLong(3)
      assert(sentinelIds(inT) == (0L until n) && sentinelIds(tgT) == (0L until n),
        s"doc $id sentinels not sequential")
    }
  }

  test("property: line repetition fractions are consistent bounds on random docs") {
    val docGen = Gen.listOfN(25, Gen.oneOf("x", "y", "z"))
      .map(_.mkString(" "))
    val docs = samples(docGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rows = graft.operators.Repetition
      .lineStats(docs.toDF("doc_id", "text"), "doc_id", "text", lineTokens = 4)
      .collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val (nl, nd, lf, cf) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nl >= 1 && nd < nl, s"dup lines must leave a first occurrence: $r")
      assert(lf >= 0.0 && lf < 1.0 && cf >= 0.0 && cf <= 1.0, s"fractions: $r")
      assert(lf == nd.toDouble / nl, s"dup_line_frac definition: $r")
    }
  }

  test("property: cdc resemblance is symmetric-free and bounded by 1e6 ppm") {
    val docGen = Gen.listOfN(30, Gen.oneOf("p", "q", "r", "s", "t", "u"))
      .map(_.mkString(" "))
    val docs = samples(docGen, 25).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val pairs = graft.operators.Dedup
      .cdcNearDupPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        w = 3, divisor = 4L, maxDf = 25L, minJacPpm = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    pairs.foreach { case (a, b, jac) =>
      assert(a < b, s"orientation must be canonical: ($a, $b)")
      assert(jac >= 1L && jac <= 1000000L, s"jac_ppm out of range: $jac")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "no duplicate pairs")
  }

  test("property: waterFillCaps conserves the budget exactly") {
    // random domain tables + budgets: sum(allocated) + remainder ==
    // min(budget, total); allocations never exceed the size; capped
    // domains all sit at the same waterline
    val sizes = samples(Gen.listOfN(7, Gen.chooseNum(0L, 500L)), 12)
    val budgets = samples(Gen.chooseNum(0L, 3000L), 12)
    sizes.zip(budgets).foreach { case (ns, b) =>
      val per = ns.zipWithIndex.map { case (n, i) => (s"d$i", n) }
        .toDF("src", "n")
      val out = graft.operators.Budget.waterFillCaps(per, "src", "n", b)
        .collect()
      val total = ns.sum
      val allocated = out.map(_.getAs[Long]("allocated")).sum
      val rem = out.head.getAs[Long]("remainder")
      assert(allocated + rem == math.min(b, total) ||
        (b >= total && allocated == total && rem == b - total),
        s"budget not conserved: ns=$ns b=$b alloc=$allocated rem=$rem")
      out.foreach { r =>
        assert(r.getAs[Long]("allocated") <= r.getAs[Long]("n_tokens"))
        if (!r.isNullAt(r.fieldIndex("cap")))
          assert(r.getAs[Long]("allocated") <=
            math.max(r.getAs[Long]("cap"), 0L) ||
            r.getAs[Long]("n_tokens") <= r.getAs[Long]("cap"))
      }
    }
  }

  test("property: packWhole never overflows a bin and never splits a doc") {
    import graft.operators.Packing
    val lens = samples(Gen.chooseNum(0L, 150L), 300)
    val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n")
    for (capacity <- Seq(64L, 100L); m <- Seq(2, 4, 8)) {
      val got = Packing.packWhole(docs, "doc_id", "n", capacity, m,
          bucketWidth = 17L).collect()
      // total function: every doc exactly once
      assert(got.map(_.getAs[Long]("doc_id")).toSet == lens.indices.map(_.toLong).toSet)
      got.groupBy(r => (r.getAs[Long]("size_class"), r.getAs[Long]("bin")))
        .foreach { case ((sc, bin), rows) =>
          val tot = rows.map(_.getAs[Long]("n_tokens")).sum
          if (sc > 0)
            assert(tot <= capacity, s"cap=$capacity m=$m bin($sc,$bin)=$tot")
          else rows.foreach(r =>
            assert(r.getAs[Long]("n_tokens") > capacity, "class 0 = oversize only"))
        }
    }
  }

  test("property: weightedSample is stable under row order and partitioning") {
    import graft.operators.Sampling
    val rows = samples(Gen.zip(Gen.chooseNum(0L, 100000L),
      Gen.chooseNum(-5L, 500L)), 200).distinctBy(_._1)
      .map { case (id, w) => (id, s"g${id % 4}", w) }
    val base = rows.toDF("id", "grp", "w")
    val expected = Sampling.weightedSample(base, Seq("grp"), "id", "w", 4)
      .orderBy($"grp", $"rn").collect().toSeq
    val shuffled = new scala.util.Random(7).shuffle(rows)
    for (variant <- Seq(shuffled.toDF("id", "grp", "w"),
        base.repartition(13, $"w"))) {
      val got = Sampling.weightedSample(variant, Seq("grp"), "id", "w", 4)
        .orderBy($"grp", $"rn").collect().toSeq
      assert(got == expected)
    }
  }

  test("property: quantile sketch guarantee holds on random data and merge trees") {
    import graft.functions.expressions.QuantileSketchAgg
    val k = 32
    val vals = samples(Gen.chooseNum(-1e6, 1e6), 20000)
    def fromSeq(s: Seq[Double]): QuantileSketchAgg.Sketch = {
      val sk = new QuantileSketchAgg.Sketch(k)
      s.foreach(sk.add)
      sk
    }
    // random balanced-ish and lopsided merge trees over random shards
    // (mergeIn MUTATES, so each tree gets its own fresh shard sketches)
    def shards() = vals.grouped(700).map(fromSeq).toSeq
    val lopsided = {
      val s = shards(); val acc = s.head; s.tail.foreach(acc.mergeIn); acc
    }
    val paired = {
      var layer = shards()
      while (layer.length > 1)
        layer = layer.grouped(2).map { g =>
          if (g.length == 2) { g.head.mergeIn(g(1)); g.head } else g.head
        }.toSeq
      layer.head
    }
    val sorted = vals.sorted
    for (sk <- Seq(fromSeq(vals), lopsided, paired); q <- Seq(0.05, 0.5, 0.95)) {
      assert(sk.n == vals.size.toLong)
      val bound = 2L * (sk.levels.length + 1) * vals.size / k + 1
      val est = sk.quantile(q)
      val lt = sorted.count(_ < est).toLong
      val le = sorted.count(_ <= est).toLong
      val target = math.max(1L, math.ceil(q * vals.size).toLong)
      val err = if (target < lt + 1) lt + 1 - target
                else if (target > le) target - le else 0L
      assert(err <= bound, s"q=$q err=$err bound=$bound")
    }
  }

  test("property: multi-touch credit conserves exactly 1e6 ppm per conversion") {
    // random journeys: every conversion's credits must sum to exactly
    // one million ppm under BOTH models, and total revenue must
    // reconcile — the no-lost-pennies invariant the division-free
    // design exists for
    val rnd = new scala.util.Random(17)
    val H = 3600L * 1000000L
    val rows = (0 until 200).map { i =>
      val u = rnd.nextInt(8).toLong
      val isConv = rnd.nextInt(5) == 0
      val ch = if (isConv) "purchase"
        else Seq("click", "view")(rnd.nextInt(2))
      (u, new java.sql.Timestamp((i.toLong * H) / 1000L / 1000L * 1000L),
        i.toLong, ch, if (isConv) rnd.nextInt(1000) / 100.0 else 0.0)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = graft.operators.Attribution.multiTouch(df, "user_id", "ts",
        "event_id", "event_type", "value", Seq("click", "view"),
        "purchase", windowMicros = 48L * H)
      .collect()
    val nConv = rows.count(_._4 == "purchase").toLong
    Seq("linear", "position").foreach { m =>
      val tot = out.filter(_.getAs[String]("model") == m)
        .map(_.getAs[Long]("conversions_ppm")).sum
      assert(tot == nConv * 1000000L,
        s"$m credit must conserve: $tot vs ${nConv * 1000000L}")
      // revenue reconciles to the milli-cent
      val rev = out.filter(_.getAs[String]("model") == m)
        .map(_.getAs[Long]("revenue_milli_cents")).sum
      val want = rows.filter(_._4 == "purchase")
        .map(r => math.round(r._5 * 100) * 1000L).sum
      assert(math.abs(rev - want) < out.length,
        s"$m revenue $rev vs $want (truncation < 1 milli-cent per row)")
    }
  }

  test("property: quantile normalization is a monotone within-group map") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
    val out = graft.operators.Calibrate.quantileNormalize(
        rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v"),
        r.getAs[Long]("normalized")))
    out.groupBy(_._1).foreach { case (g, ms) =>
      val sorted = ms.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, v1, n1), (_, v2, n2)) =>
          assert(n1 <= n2, s"group $g: v $v1->$n1 but $v2->$n2")
        case _ =>
      }
    }
    // normalized values come from the global value set
    val global = rows.map(_._2).toSet
    assert(out.forall(m => global.contains(m._3)))
  }

  // ---- sequence-pattern family vs a brute-force reference ----------
  // Random per-entity event streams (with deliberate same-ts
  // collisions) checked against direct quantifier evaluation of the
  // documented semantics — the window/flag machinery must agree with
  // "∃ occurrences ..." verbatim.

  private val min = 60000000L

  private def randomEvents(seed: Int): Seq[(String, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    for {
      e <- (0 until 6).map(i => s"e$i")
      _ <- 0 until (3 + rnd.nextInt(10))
    } yield (e, rnd.nextInt(50) * min, Seq("a", "b", "c")(rnd.nextInt(3)))
  }

  private def perEntity(rows: Seq[(String, Long, String)])
      : Map[String, Seq[(Long, String)]] =
    rows.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap

  private def brutePair(ev: Seq[(Long, String)], a: String, b: String,
                        g: Long): Boolean =
    ev.exists { case (ta, t1) => t1 == a &&
      ev.exists { case (tb, t2) => t2 == b && ta < tb && tb <= ta + g } }

  private def bruteTriple(ev: Seq[(Long, String)], a: String, b: String,
                          c: String, g2: Long, g3: Long): Boolean =
    ev.exists { case (ta, t1) => t1 == a &&
      ev.exists { case (tb, t2) => t2 == b && ta < tb && tb <= ta + g2 &&
        ev.exists { case (tc, t3) => t3 == c && tb < tc && tc <= tb + g3 } } }

  test("property: level2 pattern counts match brute-force ∃-pair evaluation") {
    for (seed <- Seq(7, 11, 13)) {
      val rows = randomEvents(seed)
      val pe = perEntity(rows)
      val g = 10 * min
      val got = graft.operators.SeqPatterns.level2(
          rows.toDF("u", "us", "t")
            .withColumn("ts", timestamp_micros(col("us"))),
          "u", "ts", "t", Seq("a", "b", "c"), maxGapMinutes = 10L)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_entities"))
        .toMap
      for (a <- Seq("a", "b", "c"); b <- Seq("a", "b", "c")) {
        val want = pe.values.count(brutePair(_, a, b, g)).toLong
        assert(got.getOrElse((a, b), 0L) == want,
          s"seed $seed <$a,$b>: got ${got.get((a, b))}, brute $want")
      }
    }
  }

  test("property: level3 triple counts match brute-force ∃-chain evaluation") {
    for (seed <- Seq(17, 19)) {
      val rows = randomEvents(seed)
      val pe = perEntity(rows)
      val g = 10 * min
      val got = graft.operators.SeqPatterns.level3(
          rows.toDF("u", "us", "t")
            .withColumn("ts", timestamp_micros(col("us"))),
          "u", "ts", "t", Seq("a", "b", "c"), maxGapMinutes = 10L)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getAs[Long]("n_entities"))
        .toMap
      for (a <- Seq("a", "b", "c"); b <- Seq("a", "b", "c");
           c <- Seq("a", "b", "c")) {
        val want = pe.values.count(bruteTriple(_, a, b, c, g, g)).toLong
        assert(got.getOrElse((a, b, c), 0L) == want,
          s"seed $seed <$a,$b,$c>: got ${got.get((a, b, c))}, brute $want")
      }
    }
  }

  test("property: funnel drop-off buckets match brute-force evaluation and tile") {
    for (seed <- Seq(29, 31)) {
      val rows = randomEvents(seed)
      val pe = perEntity(rows)
      val (g2, g3) = (10 * min, 5 * min)
      def reach2(ev: Seq[(Long, String)]) = brutePair(ev, "a", "b", g2)
      def reach3(ev: Seq[(Long, String)]) =
        bruteTriple(ev, "a", "b", "c", g2, g3)
      def saw2(ev: Seq[(Long, String)]) =
        ev.exists { case (ta, t1) => t1 == "a" &&
          ev.exists { case (tb, t2) => t2 == "b" && tb > ta } }
      def saw3(ev: Seq[(Long, String)]) =
        ev.exists { case (ta, t1) => t1 == "a" &&
          ev.exists { case (tb, t2) => t2 == "b" && ta < tb &&
            tb <= ta + g2 &&
            ev.exists { case (tc, t3) => t3 == "c" && tc > tb } } }
      val evs = pe.values.toSeq
      val nu = evs.size.toLong
      val n1 = evs.count(_.exists(_._2 == "a")).toLong
      val n2 = evs.count(reach2).toLong
      val n3 = evs.count(reach3).toLong
      val ge2 = evs.count(e =>
        e.exists(_._2 == "a") && !reach2(e) && saw2(e)).toLong
      val ge3 = evs.count(e => reach2(e) && !reach3(e) && saw3(e)).toLong
      val got = graft.operators.SeqPatterns.funnelDropoff3(
          rows.toDF("u", "us", "t")
            .withColumn("ts", timestamp_micros(col("us"))),
          "u", "ts", "t", Seq("a", "b", "c"), gapsMinutes = Seq(10L, 5L))
        .collect().map(r => r.getAs[Long]("step") ->
          ((r.getAs[Long]("n_entered"), r.getAs[Long]("n_reached"),
            r.getAs[Long]("n_gap_expired"), r.getAs[Long]("n_absent"))))
        .toMap
      assert(got(1L) == ((nu, n1, 0L, nu - n1)), s"seed $seed step1 ${got(1L)}")
      assert(got(2L) == ((n1, n2, ge2, n1 - n2 - ge2)),
        s"seed $seed step2 ${got(2L)}")
      assert(got(3L) == ((n2, n3, ge3, n2 - n3 - ge3)),
        s"seed $seed step3 ${got(3L)}")
      // the buckets tile: reached + gap_expired + absent == entered
      got.values.foreach { case (en, re, ge, ab) =>
        assert(re + ge + ab == en && re >= 0 && ge >= 0 && ab >= 0)
      }
    }
  }

  test("property: level2/level3/funnel reached counts are monotone in the gap") {
    val rows = randomEvents(37)
    val df = rows.toDF("u", "us", "t")
      .withColumn("ts", timestamp_micros(col("us")))
    def l2(g: Long) = graft.operators.SeqPatterns.level2(
        df, "u", "ts", "t", Seq("a", "b", "c"), maxGapMinutes = g)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_entities")).toMap
    val (s5, s20) = (l2(5L), l2(20L))
    for ((k, v) <- s5)
      assert(s20.getOrElse(k, 0L) >= v, s"$k: gap 20 lost entities vs gap 5")
    def f(g: Long) = graft.operators.SeqPatterns.funnelDropoff3(
        df, "u", "ts", "t", Seq("a", "b", "c"), gapsMinutes = Seq(g, g))
      .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_reached"))
      .toMap
    val (f5, f20) = (f(5L), f(20L))
    for (step <- Seq(1L, 2L, 3L))
      assert(f20(step) >= f5(step), s"step $step not monotone in gap")
  }

  // ---- exact-join family vs filter-free brute force ------------------
  // PPJoin (q244) and FastSS (q168) are EXACT joins whose entire value
  // is the filters (prefix/positional/extended-prefix; deletion
  // neighborhoods + hash candidates). The fixtures pin specific
  // corpora; these properties check the filters lose nothing across
  // random small corpora and the parameter space (tau sweeps, singleton
  // and identical sets, near-threshold sizes, collision-dense short
  // strings) against direct all-pairs evaluation of the definition.

  private def randomSets(seed: Int, n: Int): Map[Long, Set[String]] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 8).map(i => s"t$i")
    (0L until n.toLong).map { id =>
      id -> rnd.shuffle(vocab).take(1 + rnd.nextInt(6)).toSet
    }.toMap
  }

  test("property: PPJoin jaccard join matches brute-force all-pairs at every tau") {
    for (seed <- Seq(41, 43); tauPpm <- Seq(300000L, 500000L, 800000L, 1000000L)) {
      val sets = randomSets(seed, 30) +
        // identical-set and singleton corners the generator may miss
        (100L -> Set("t0")) + (101L -> Set("t0")) +
        (102L -> Set("t1", "t2", "t3"))
      val ids = sets.toSeq.flatMap { case (id, es) => es.map(e => (id, e)) }
        .toDF("id", "elem")
      val got = graft.operators.SetJoin.jaccardJoin(ids, "id", "elem", tauPpm)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          ((r.getAs[Long]("inter"), r.getAs[Long]("sz_a"),
            r.getAs[Long]("sz_b"), r.getAs[Long]("jaccard_ppm"))))
        .toMap
      val keys = sets.keys.toSeq.sorted
      val want = (for {
        i <- keys.indices; j <- (i + 1) until keys.size
        (a, b) = (keys(i), keys(j))
        inter = (sets(a) intersect sets(b)).size.toLong
        uni = (sets(a).size + sets(b).size).toLong - inter
        if inter * 1000000L >= uni * tauPpm
      } yield (a, b) -> ((inter, sets(a).size.toLong, sets(b).size.toLong,
        inter * 1000000L / uni))).toMap
      assert(got == want,
        s"seed $seed tau $tauPpm: missing ${want.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- want.keySet}")
    }
  }

  private def bruteLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: FastSS edit-distance join matches brute-force all-pairs at tau 1 and 2") {
    for (seed <- Seq(47, 53); tau <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      // short strings over a 3-char alphabet: collision-dense deletion
      // neighborhoods (many strings share variants), plus duplicates
      // (distinct() contract) and the empty/1-char boundary
      val strs = (0 until 40).map(_ =>
        (0 until rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString) ++ Seq("", "a", "a")
      val got = graft.operators.EditDistance.pairs(
          strs.map(Tuple1(_)).toDF("s"), "s", tau)
        .collect()
        .map(r => (r.getAs[String]("s_a"), r.getAs[String]("s_b")) ->
          r.getAs[Long]("dist"))
        .toMap
      val ds = strs.distinct.sorted
      val want = (for {
        i <- ds.indices; j <- (i + 1) until ds.size
        d = bruteLev(ds(i), ds(j))
        if d <= tau
      } yield (ds(i), ds(j)) -> d.toLong).toMap
      assert(got == want,
        s"seed $seed tau $tau: missing ${want.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- want.keySet}")
    }
  }
}
