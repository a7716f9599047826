package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: positions tile the token stream exactly; every bin
  * but the last is full; bucketWidth never changes the answer (the
  * two-phase cumsum is a pure decomposition of the global one).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, 100L), (1L, 300L), (2L, 56L), (3L, 200L), (4L, 1L),
    (5L, 255L), (6L, 512L), (7L, 44L)).toDF("doc_id", "n")

  test("packPositions is an exact exclusive cumsum in id order") {
    val pos = Packing.packPositions(docs, "doc_id", "n", capacity = 256L,
        bucketWidth = 3L)
      .orderBy("doc_id").collect()
    val expectedStarts = Seq(0L, 100L, 400L, 456L, 656L, 657L, 912L, 1424L)
    assert(pos.map(_.getAs[Long]("start_off")).toSeq == expectedStarts)
    // first/last bins follow from the offsets
    val r1 = pos(1) // start 100, 300 tokens -> bins 0..1
    assert(r1.getAs[Long]("first_bin") == 0L && r1.getAs[Long]("last_bin") == 1L)
    val r6 = pos(6) // start 912, 512 tokens -> bins 3..5
    assert(r6.getAs[Long]("first_bin") == 3L && r6.getAs[Long]("last_bin") == 5L)
  }

  test("packBins fills every bin except the last to capacity") {
    val bins = Packing.packBins(docs, "doc_id", "n", capacity = 256L,
        bucketWidth = 3L).orderBy("bin").collect()
    val total = 100L + 300L + 56L + 200L + 1L + 255L + 512L + 44L // 1468
    assert(bins.map(_.getAs[Long]("n_tokens")).sum == total)
    val fills = bins.map(_.getAs[Long]("n_tokens")).toSeq
    assert(fills.init.forall(_ == 256L), s"non-final bin underfilled: $fills")
    assert(fills.last == total % 256L)
    // every doc starts in exactly one bin
    assert(bins.map(_.getAs[Long]("n_starting")).sum == 8L)
  }

  test("bucketWidth does not change the packing") {
    val a = Packing.packBins(docs, "doc_id", "n", 256L, bucketWidth = 2L)
      .orderBy("bin").collect().toSeq
    val b = Packing.packBins(docs, "doc_id", "n", 256L, bucketWidth = 1000L)
      .orderBy("bin").collect().toSeq
    assert(a == b)
  }

  test("zero-token rows occupy no bin but keep their offset") {
    val withEmpty = Seq((0L, 0L), (1L, 10L), (2L, 0L), (3L, 10L))
      .toDF("doc_id", "n")
    val pos = Packing.packPositions(withEmpty, "doc_id", "n", 8L, 2L)
      .orderBy("doc_id").collect()
    assert(pos.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 0L, 10L, 10L))
    // zero-token rows: last_bin clamps to first_bin (== the bin of the
    // start offset), including the doc at offset 0 — the streaming
    // processor's formula, pinned identical here
    for (r <- Seq(pos(0), pos(2))) {
      assert(r.getAs[Long]("first_bin") == r.getAs[Long]("last_bin"))
      assert(r.getAs[Long]("first_bin") == r.getAs[Long]("start_off") / 8L)
    }
    val bins = Packing.packBins(withEmpty, "doc_id", "n", 8L, 2L)
      .agg(sum("n_tokens")).as[Long].head()
    assert(bins == 20L)
  }

  test("bucket ids use exact integer floor-div: 2^53+ and negative order keys") {
    // beyond 2^53 a double cast can no longer represent adjacent longs,
    // so bucket edges computed via doubles would misplace rows; pmod
    // keeps floor semantics for negative keys
    val big = Seq(
      (-7L, 3L), (-1L, 2L),
      ((1L << 53) + 1L, 5L), ((1L << 53) + 2L, 4L)).toDF("doc_id", "n")
    val pos = Packing.packPositions(big, "doc_id", "n", 4L, bucketWidth = 2L)
      .orderBy("doc_id").collect()
    assert(pos.map(_.getAs[Long]("start_off")).toSeq == Seq(0L, 3L, 5L, 10L))
  }

  test("efficiencyReport: hand-checked stats per capacity from one pass") {
    import spark.implicits._
    // stream: 6 + 4 + 10 = 20 tokens in id order
    val docs = Seq((1L, 6L), (2L, 4L), (3L, 10L)).toDF("doc_id", "n")
    val r = Packing.efficiencyReport(docs, "doc_id", "n", Seq(8L, 16L))
      .orderBy("capacity")
      .collect().map(x => (x.getAs[Long]("capacity"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("total_tokens"), x.getAs[Long]("n_bins"),
        x.getAs[Long]("fill_ppm"), x.getAs[Long]("straddling_docs")))
    // cap 8: bins [0,8),[8,16),[16,24); starts 0,6,10 -> doc2 spans 6..9
    //   (straddles), doc3 spans 10..19 (straddles) -> 2; fill 20/24
    // cap 16: bins [0,16),[16,32); doc3 spans 10..19 straddles -> 1;
    //   fill 20/32
    assert(r(0) === ((8L, 3L, 20L, 3L, 1000000L * 20 / 24, 2L)))
    assert(r(1) === ((16L, 3L, 20L, 2L, 1000000L * 20 / 32, 1L)))
  }

  test("packWhole: no bin exceeds capacity; class-k bins hold <= k docs") {
    import spark.implicits._
    // capacity 64, m 4: class 0 n>64, class 1 (32,64], class 2 [22,32],
    // class 3 [17,21], class 4 tail n<=16 (threshold T = 48)
    val docs = (0L until 60L).map(i => (i, (i * 13L) % 90L + 1L))
      .toDF("doc_id", "n")
    val got = Packing.packWhole(docs, "doc_id", "n", capacity = 64L, m = 4,
        bucketWidth = 7L).collect()
    val byBin = got.groupBy(r =>
      (r.getAs[Long]("size_class"), r.getAs[Long]("bin")))
    byBin.foreach { case ((sc, bin), rows) =>
      if (sc > 0) { // oversize bins legitimately exceed capacity (flagged)
        val tot = rows.map(_.getAs[Long]("n_tokens")).sum
        assert(tot <= 64L, s"bin ($sc, $bin) overflows: $tot")
      }
      if (sc >= 1 && sc < 4)
        assert(rows.length <= sc, s"class-$sc bin $bin has ${rows.length} docs")
      if (sc == 0) assert(rows.length == 1, "oversize docs pack alone")
    }
    // every doc appears exactly once
    assert(got.map(_.getAs[Long]("doc_id")).toSet == (0L until 60L).toSet)
    // classing is correct
    got.foreach { r =>
      val (n, sc) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("size_class"))
      val expected = if (n > 64) 0L else math.min(64L / n, 4L)
      assert(sc == expected, s"n=$n sc=$sc")
    }
  }

  test("packWhole: full rank-class bins are > k/(k+1) full; tail bins chunk at T") {
    import spark.implicits._
    // all class-2 docs (n in [22, 32]): bins of exactly 2, fill > 2/3*64
    val c2 = (0L until 9L).map(i => (i, 22L + i)).toDF("doc_id", "n")
    val got2 = Packing.packWhole(c2, "doc_id", "n", 64L, m = 4, bucketWidth = 4L)
      .collect()
    val bins2 = got2.groupBy(_.getAs[Long]("bin")).view
      .mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    // 9 docs -> bins 0..3 of 2 docs + bin 4 with the leftover
    assert(bins2.keySet == Set(0L, 1L, 2L, 3L, 4L))
    bins2.filter(_._1 < 4L).values.foreach(t => assert(t > 64L * 2 / 3))
    // tail docs chunk on running offset div T (T = 48): 10 docs of 12
    // tokens -> starts 0,12,... bin = start div 48 -> 4 docs per bin
    val tail = (0L until 10L).map(i => (i, 12L)).toDF("doc_id", "n")
    val gotT = Packing.packWhole(tail, "doc_id", "n", 64L, m = 4, bucketWidth = 3L)
      .orderBy($"doc_id").collect()
    assert(gotT.map(_.getAs[Long]("bin")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L, 2L))
    val binTotals = gotT.groupBy(_.getAs[Long]("bin")).view
      .mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
    binTotals.values.foreach(t => assert(t <= 64L))
  }

  test("packWhole: bucketWidth is a pure decomposition knob") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, (i * 31L) % 80L)).toDF("doc_id", "n")
    val a = Packing.packWhole(docs, "doc_id", "n", 64L, m = 4, bucketWidth = 3L)
      .orderBy($"doc_id").collect().toSeq
    val b = Packing.packWhole(docs.repartition(6), "doc_id", "n", 64L, m = 4,
        bucketWidth = 1000L)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("paddingReport: exact power-of-two buckets and hand-checked waste") {
    import spark.implicits._
    // boundary lengths: 1->1, 2->2, 3->4, 4->4, 5->8, 64->64, 65->128, 0->1
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 64L, 65L, 0L).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val got = Packing.paddingReport(docs, "n", batchSize = 2L)
      .orderBy($"bucket_len").collect()
      .map(r => (r.getAs[Long]("bucket_len"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_batches"),
        r.getAs[Long]("pad_ppm"))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1L, 500000L),          // lens 0,1
      (2L, 1L, 2L, 1L, 0L),               // len 2
      (4L, 2L, 7L, 1L, 1000000L * 1 / 8), // lens 3,4
      (8L, 1L, 5L, 1L, 1000000L * 3 / 8), // len 5
      (64L, 1L, 64L, 1L, 0L),             // len 64 exact power stays
      (128L, 1L, 65L, 1L, 1000000L * 63 / 128))) // len 65
  }
}
