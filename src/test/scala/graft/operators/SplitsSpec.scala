package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, permille-proportional-ish, dedups ids") {
    val ids = (1L to 1000L).map(i => (i, s"t$i"))
    val once = Splits.hashSplit(ids.toDF("id", "x"), "id", 800)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val again = Splits.hashSplit(
        (ids ++ ids).toDF("id", "x"), "id", 800)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(once == again, "re-run + duplicate-row stable")
    val frac = once.values.count(identity).toDouble / once.size
    assert(frac > 0.75 && frac < 0.85, s"~80% train, got $frac")
    // the pinned hash rule
    once.foreach { case (id, t) =>
      assert(t == (Math.floorMod(id * 1000003L + 17L, 1000000007L)
        % 1000 < 800))
    }
  }

  test("leakageAudit: straddling pairs counted exactly; edge cases") {
    val assign = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("id", "is_train")
    // (1,2) same side, (2,3) cross, (3,4) same, (1,4) cross;
    // (1,99) has an unassigned id -> drops
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 99L))
      .toDF("id_a", "id_b")
    val out = Splits.leakageAudit(assign, pairs, "id").collect().head
    assert(out.getAs[Long]("n_train") == 2L)
    assert(out.getAs[Long]("n_test") == 2L)
    assert(out.getAs[Long]("n_pairs") == 4L)
    assert(out.getAs[Long]("n_cross") == 2L)
    assert(out.getAs[Long]("cross_ppm") == 500000L)
    // no pairs at all: ppm null, sizes intact
    val none = Splits.leakageAudit(assign,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id")
      .collect().head
    assert(none.getAs[Long]("n_pairs") == 0L)
    assert(none.isNullAt(none.fieldIndex("cross_ppm")))
  }
}
