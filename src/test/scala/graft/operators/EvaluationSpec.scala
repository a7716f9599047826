package graft.operators

import graft.SparkSpec

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(String, Long, Boolean)],
                  bucketWidth: Long = 1000L) =
    Evaluation.aucByGroup(rows.toDF("g", "s", "y"), "s", "y", "g", bucketWidth)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          Option(r.getAs[Any]("auc_ppm")).map(_.asInstanceOf[Long])))
      .toMap

  test("perfect separation is 1e6, inverted is 0, all-tied is 5e5") {
    val perfect = (1L to 5L).map(i => ("a", 10L + i, true)) ++
      (1L to 5L).map(i => ("a", i, false))
    assert(auc(perfect)("a") == ((5L, 5L, Some(1000000L))))
    val inverted = perfect.map { case (g, s, y) => (g, s, !y) }
    assert(auc(inverted)("a") == ((5L, 5L, Some(0L))))
    val tied = Seq(("a", 7L, true), ("a", 7L, true), ("a", 7L, false))
    assert(auc(tied)("a") == ((2L, 1L, Some(500000L))))
  }

  test("midrank ties: pos {3,1} vs neg {2,1} gives U=2.5 -> 625000") {
    // pairs: (3,2)=1 (3,1)=1 (1,2)=0 (1,1)=0.5 -> U=2.5, AUC=2.5/4
    val rows = Seq(("a", 3L, true), ("a", 1L, true),
      ("a", 2L, false), ("a", 1L, false))
    assert(auc(rows)("a") == ((2L, 2L, Some(625000L))))
  }

  test("single-class groups report null AUC; groups are independent") {
    val rows = Seq(("pos_only", 5L, true), ("pos_only", 6L, true),
      ("mixed", 2L, true), ("mixed", 1L, false))
    val out = auc(rows)
    assert(out("pos_only") == ((2L, 0L, None)))
    assert(out("mixed") == ((1L, 1L, Some(1000000L))))
  }

  test("bucketWidth never changes the result (two-phase seam)") {
    val rows = (1L to 200L).map(i =>
      ("a", i * 37L % 101L, i % 3 == 0)) // ties + interleaving
    val r1 = auc(rows, bucketWidth = 1L)
    val r7 = auc(rows, bucketWidth = 7L)
    val rBig = auc(rows, bucketWidth = 1000000L)
    assert(r1 == r7 && r7 == rBig)
  }

  test("negative scores bucket correctly (floor, not truncate)") {
    val rows = Seq(("a", -3L, false), ("a", -1L, true),
      ("a", 2L, true), ("a", -5L, false))
    // negs {-3,-5} both below both pos -> perfect
    assert(auc(rows, bucketWidth = 2L)("a") == ((2L, 2L, Some(1000000L))))
  }

  test("null scores and labels are excluded, not treated as negatives") {
    val df = Seq[(String, Option[Long], Option[Boolean])](
      ("a", Some(5L), Some(true)), ("a", Some(1L), Some(false)),
      ("a", None, Some(false)), ("a", Some(9L), None))
      .toDF("g", "s", "y")
    val out = Evaluation.aucByGroup(df, "s", "y", "g").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_pos") == 1L && out(0).getAs[Long]("n_neg") == 1L)
    assert(out(0).getAs[Long]("auc_ppm") == 1000000L)
  }

  test("rankingReport: hand-computed MRR / P@k / recall / AP@k") {
    // q1: rel at ranks 2 and 4 of 5, 3 relevant total
    //   mrr = 1e6 div 2 = 500000; p@5 = 2e6 div 5 = 400000
    //   recall = 2e6 div 3 = 666666
    //   apn = (1e6*1) div 2 + (1e6*2) div 4 = 500000 + 500000 = 1000000
    //   ap = 1000000 div min(5,3) = 333333
    // q2: no relevant, 0 total -> mrr 0, p 0, recall null, ap null
    // q3: rel at rank 1, 1 total -> all 1e6
    val ranked = Seq(
      (1L, 1, false), (1L, 2, true), (1L, 3, false), (1L, 4, true),
      (1L, 5, false),
      (2L, 1, false), (2L, 2, false),
      (3L, 1, true), (3L, 2, false))
      .toDF("query_id", "rank", "rel")
    val totals = Seq((1L, 3L), (2L, 0L), (3L, 1L)).toDF("query_id", "n_rel")
    val got = Evaluation.rankingReport(
        ranked, "query_id", "rank", "rel", totals, "n_rel", k = 5)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("mrr_ppm"), r.getAs[Long]("p_at_k_ppm"),
          Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got(1L) == ((500000L, 400000L, Some(666666L), Some(333333L))))
    assert(got(2L) == ((0L, 0L, None, None)))
    assert(got(3L) == ((1000000L, 200000L, Some(1000000L), Some(1000000L))))
  }

  test("rankingReport: a query missing from totals gets null recall/ap") {
    val ranked = Seq((7L, 1, true)).toDF("query_id", "rank", "rel")
    val totals = Seq.empty[(Long, Long)].toDF("query_id", "n_rel")
    val r = Evaluation.rankingReport(
      ranked, "query_id", "rank", "rel", totals, "n_rel", k = 1).collect()(0)
    assert(r.getAs[Long]("mrr_ppm") == 1000000L)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }
}
