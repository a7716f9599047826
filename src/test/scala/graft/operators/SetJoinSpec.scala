package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def runJoin(sets: Map[Long, Set[Long]], tauPpm: Long) = {
    val ids = sets.toSeq.flatMap { case (id, es) => es.map(id -> _) }
    SetJoin.jaccardJoin(ids.toDF("id", "elem"), "id", "elem", tauPpm)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
  }

  private def brute(sets: Map[Long, Set[Long]], tauPpm: Long) = {
    val ks = sets.keys.toSeq.sorted
    (for {
      i <- ks.indices; j <- (i + 1) until ks.length
      a = sets(ks(i)); b = sets(ks(j))
      inter = (a & b).size.toLong
      union = (a | b).size.toLong
      if union > 0 && inter * 1000000L >= tauPpm * union
    } yield (ks(i), ks(j)) -> inter * 1000000L / union).toMap
  }

  test("hand fixture: qualifying, boundary, and pruned pairs") {
    val sets = Map(
      1L -> Set(10L, 11L, 12L, 13L),  // J(1,2) = 3/5 = 0.6
      2L -> Set(10L, 11L, 12L, 14L),
      3L -> Set(10L, 99L),            // J(1,3) = 1/5 = 0.2
      4L -> Set(50L, 51L))            // disjoint from all
    val got = runJoin(sets, 500000L)
    assert(got == Map((1L, 2L) -> 600000L))
    // lowering tau admits the weak pair
    assert(runJoin(sets, 200000L).keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("identical sets and tau = 1.0 (prefix shrinks to one element)") {
    val sets = Map(1L -> Set(5L, 6L, 7L), 2L -> Set(5L, 6L, 7L),
      3L -> Set(5L, 6L))
    val got = runJoin(sets, 1000000L)
    assert(got == Map((1L, 2L) -> 1000000L))
  }

  test("adaptive 2-token prefix: candidates shrink on a template-dense corpus, losslessly") {
    // Template-dense regime: every record draws from one shared
    // medium-size vocabulary (no unique tokens), so document
    // frequencies are flat and the rarest-first prefix can't isolate —
    // random pairs share exactly one prefix element and flood the
    // classical candidate set. The ℓ=2 count filter must cut them
    // while the final result stays brute-exact.
    val rnd = new scala.util.Random(7)
    val sets = (1L to 50L).map { i =>
      val toks = scala.collection.mutable.Set.empty[Long]
      while (toks.size < 10) toks += (rnd.nextInt(60) + 100).toLong
      i -> toks.toSet
    }.toMap
    val tau = 600000L // prefix = 5 rarest (+1 extended)
    val ids = sets.toSeq.flatMap { case (id, es) => es.map(id -> _) }
      .toDF("id", "elem")
    val sizes = ids.groupBy(col("id")).agg(count(lit(1)).as("__sz"))
    val c1 = SetJoin.candidatePairs(ids, sizes, "id", "elem", tau, ell = 1)
      .count()
    val c2 = SetJoin.candidatePairs(ids, sizes, "id", "elem", tau, ell = 2)
      .count()
    assert(c2 < c1, s"ell=2 must tighten: $c2 vs $c1")
    assert(runJoin(sets, tau) == brute(sets, tau))
  }

  test("property: lossless vs brute force across thresholds and corpora") {
    val gen = Gen.listOfN(14,
      Gen.zip(Gen.choose(1L, 14L), Gen.nonEmptyListOf(Gen.choose(1L, 9L))))
    val cases = (0 until 5).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(401L + i)))
    // small element universe (1..9) forces heavy overlap — the regime
    // where a too-short prefix silently drops qualifying pairs
    val corpora: Seq[Map[Long, Set[Long]]] =
      cases.map(_.map { case (id, es) => id -> es.toSet }.toMap)
    for (sets <- corpora; tau <- Seq(300000L, 500000L, 800000L)) {
      val got = runJoin(sets, tau)
      val want = brute(sets, tau)
      assert(got == want,
        s"tau=$tau sets=$sets\n got=$got\nwant=$want")
    }
  }
}
