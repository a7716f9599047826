package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) = {
    val r = Graphs.triangleStats(edges.toDF("s", "t"), "s", "t").collect()(0)
    (r.getAs[Long]("n_vertices"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"),
      Option(r.getAs[Any]("global_cc_ppm")).map(_.asInstanceOf[Long]))
  }

  test("clique K4: 4 triangles, cc = 1; chain: 0 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // wedges: each vertex deg 3 -> 4 * 3 = 12; cc = 3*4/12 = 1
    assert(run(k4) == ((4L, 6L, 12L, 4L, Some(1000000L))))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(chain) == ((4L, 3L, 2L, 0L, Some(0L))))
  }

  test("star graph: hub never enumerates pairs — wedges counted, 0 triangles") {
    val star = (2L to 30L).map(v => (1L, v))
    val (nv, ne, nw, nt, cc) = run(star)
    assert((nv, ne, nt) == ((30L, 29L, 0L)))
    assert(nw == 29L * 28L / 2)
    assert(cc == Some(0L))
  }

  test("duplicate / reversed / self-loop edges canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L),
      (2L, 3L), (3L, 1L))
    assert(run(messy) == ((3L, 3L, 3L, 1L, Some(1000000L))))
  }

  test("single edge: no wedges -> null cc") {
    assert(run(Seq((1L, 2L))) == ((2L, 1L, 0L, 0L, None)))
  }

  test("triangleEstimate pInv=1 reduces to the exact census") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (1L, 5L))
    val exact = Graphs.triangleStats(es.toDF("s", "t"), "s", "t").collect()(0)
    val est = Graphs.triangleEstimate(es.toDF("s", "t"), "s", "t", pInv = 1)
      .collect()(0)
    assert(est.getAs[Long]("n_edges") == exact.getAs[Long]("n_edges"))
    assert(est.getAs[Long]("kept_edges") == exact.getAs[Long]("n_edges"))
    assert(est.getAs[Long]("sampled_wedges") == exact.getAs[Long]("n_wedges"))
    assert(est.getAs[Long]("sampled_triangles") ==
      exact.getAs[Long]("n_triangles"))
    assert(est.getAs[Long]("est_triangles") == exact.getAs[Long]("n_triangles"))
    assert(est.getAs[Long]("est_cc_ppm") == exact.getAs[Long]("global_cc_ppm"))
  }

  test("triangleEstimate: deterministic hash coin — census of the kept subgraph, scaled") {
    // K6: 20 triangles, 15 edges. Replay the hash gate in Scala and
    // census the kept subgraph with the EXACT operator; the estimate
    // row must equal that census scaled by pInv^3 (and the pInv wedge
    // cancellation for cc).
    val p = 3
    val k6 = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val kept = k6.filter(e =>
      Math.floorMod(e._1 * 1000003L + e._2 * 7919L + 17L, 1000000007L) % p == 0)
    val ref = Graphs.triangleStats(kept.toDF("s", "t"), "s", "t").collect()(0)
    val est = Graphs.triangleEstimate(k6.toDF("s", "t"), "s", "t", pInv = p)
      .collect()(0)
    assert(est.getAs[Long]("n_edges") == 15L)
    assert(est.getAs[Long]("kept_edges") == kept.size.toLong)
    assert(est.getAs[Long]("sampled_triangles") ==
      ref.getAs[Long]("n_triangles"))
    assert(est.getAs[Long]("est_triangles") ==
      ref.getAs[Long]("n_triangles") * p * p * p)
  }

  test("triangleAuto: exact under the budget, sampled past the knee, ladder pInv") {
    // K6: 15 edges, every vertex degree 5 -> wedges = 6 * C(5,2) = 60,
    // 20 triangles, cc = 1. Budget 60 fits exactly -> exact mode.
    val k6 = (for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)).toDF("s", "t")
    val exact = Graphs.triangleAuto(k6, "s", "t", budgetWedges = 60L).collect()(0)
    assert(exact.getAs[String]("mode") == "exact")
    assert(exact.getAs[Long]("p_inv") == 1L)
    assert(exact.getAs[Long]("n_edges") == 15L)
    assert(exact.getAs[Long]("n_wedges") == 60L)
    assert(exact.getAs[Long]("est_triangles") == 20L)
    assert(exact.getAs[Long]("est_cc_ppm") == 1000000L)

    // Budget 10: ladder wants smallest power of two with 60 div p² <= 10
    // -> p=4 (60/4=15 > 10, 60/16=3 <= 10). Result must equal the
    // DOULION estimate at that pInv, with the exact wedge census kept.
    val auto = Graphs.triangleAuto(k6, "s", "t", budgetWedges = 10L).collect()(0)
    assert(auto.getAs[String]("mode") == "sampled")
    assert(auto.getAs[Long]("p_inv") == 4L)
    assert(auto.getAs[Long]("n_wedges") == 60L) // exact census, both modes
    val ref = Graphs.triangleEstimate(k6, "s", "t", pInv = 4).collect()(0)
    assert(auto.getAs[Long]("est_triangles") == ref.getAs[Long]("est_triangles"))
    assert(Option(auto.getAs[Any]("est_cc_ppm")) ==
      Option(ref.getAs[Any]("est_cc_ppm")))
  }

  test("triangleAuto: empty and wedge-free graphs stay exact with null cc") {
    val single = Seq((1L, 2L)).toDF("s", "t")
    val r = Graphs.triangleAuto(single, "s", "t", budgetWedges = 1L).collect()(0)
    assert(r.getAs[String]("mode") == "exact")
    assert(r.getAs[Long]("n_wedges") == 0L)
    assert(r.getAs[Long]("est_triangles") == 0L)
    assert(Option(r.getAs[Any]("est_cc_ppm")).isEmpty)
  }

  test("localClusteringTopK: hand fixture — clique members rank over the bridge") {
    // K4 on 1-4, pendant chain 4-5-6: per-vertex triangles 3,3,3,3,0,0;
    // cc: 1,2,3 -> 1e6; 4 (deg 4) -> 500000; 5 (deg 2) -> 0; 6 excluded
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val all = Graphs.localClusteringTopK(es.toDF("s", "t"), "s", "t", k = 10)
      .collect().map(r => (r.getAs[Long]("vertex"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("local_cc_ppm")))
    assert(all.toSeq == Seq((1L, 3L, 3L, 1000000L), (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L), (4L, 4L, 3L, 500000L), (5L, 2L, 0L, 0L)))
    // k-cut with ppm ties breaks to the smaller vertex
    val top2 = Graphs.localClusteringTopK(es.toDF("s", "t"), "s", "t", k = 2)
      .collect().map(_.getAs[Long]("vertex")).toSeq
    assert(top2 == Seq(1L, 2L))
  }

  test("localClusteringTopK property: matches brute-force per-vertex count") {
    val gen = Gen.listOfN(45,
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
    val cases = (0 until 4).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(101L + i)))
    cases.foreach { raw =>
      val es = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (es.nonEmpty) {
        val set = es.toSet
        val vs = es.flatMap(e => Seq(e._1, e._2)).distinct
        val deg = vs.map(v => v -> es.count(e => e._1 == v || e._2 == v)).toMap
        val triPerV = vs.map { v =>
          val nbrs = es.collect { case (a, b) if a == v => b
                                  case (a, b) if b == v => a }
          v -> nbrs.combinations(2).count { case Seq(p, q) =>
            set((p min q, p max q)) }
        }.toMap
        val ref = vs.filter(deg(_) >= 2).map { v =>
          (v, deg(v).toLong, triPerV(v).toLong,
            2000000L * triPerV(v) / (deg(v).toLong * (deg(v) - 1)))
        }.sortBy(r => (-r._4, r._1))
        val got = Graphs.localClusteringTopK(
            es.toDF("s", "t"), "s", "t", k = 100)
          .collect().map(r => (r.getAs[Long]("vertex"),
            r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
            r.getAs[Long]("local_cc_ppm"))).toSeq
        assert(got == ref, s"edges: $es")
      }
    }
  }

  test("localClusteringEstimate pInv=1 reduces to the exact per-vertex form") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val exact = Graphs.localClusteringTopK(es.toDF("s", "t"), "s", "t", 10)
      .collect().map(r => (r.getAs[Long]("vertex"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("local_cc_ppm"))).toSeq
    val est = Graphs.localClusteringEstimate(
        es.toDF("s", "t"), "s", "t", k = 10, pInv = 1)
      .collect().map(r => (r.getAs[Long]("vertex"), r.getAs[Long]("degree"),
        r.getAs[Long]("sampled_triangles"), r.getAs[Long]("est_cc_ppm")))
      .toSeq
    assert(est == exact)
  }

  test("localClusteringEstimate: exact degrees, kept-subgraph triangles scaled pInv³") {
    // bigger random graph so the 1/2 coin keeps some edges; reference
    // recomputes the sampled count on the JVM from the same hash gate
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L)))
    val raw = gen.apply(Gen.Parameters.default, Seed(211L)).get
    val es = raw.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val kept = es.filter { case (a, b) =>
      (a * 1000003L + b * 7919L + 17L) % 1000000007L % 2 == 0 }.toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = vs.map(v => v -> es.count(e => e._1 == v || e._2 == v)).toMap
    val triPerV = vs.map { v =>
      val nbrs = kept.toSeq.collect { case (a, b) if a == v => b
                                      case (a, b) if b == v => a }
      v -> nbrs.combinations(2).count { case Seq(p, q) =>
        kept((p min q, p max q)) }
    }.toMap
    val ref = vs.filter(deg(_) >= 2).map { v =>
      (v, deg(v).toLong, triPerV(v).toLong, 8L * triPerV(v),
        2000000L * 8L * triPerV(v) / (deg(v).toLong * (deg(v) - 1)))
    }.sortBy(r => (-r._5, r._1))
    val got = Graphs.localClusteringEstimate(
        es.toDF("s", "t"), "s", "t", k = 100, pInv = 2)
      .collect().map(r => (r.getAs[Long]("vertex"), r.getAs[Long]("degree"),
        r.getAs[Long]("sampled_triangles"), r.getAs[Long]("est_triangles"),
        r.getAs[Long]("est_cc_ppm"))).toSeq
    assert(got == ref, s"edges: $es")
  }

  test("labelPropagation: two cliques split; matches a synchronous JVM replay") {
    def replay(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nbrs = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2) }
      var lbl = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 1 to iters) {
        lbl = nbrs.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
          v -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      lbl
    }
    // K3 on 1-3, K3 on 10-12, bridge 3-10
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    for (iters <- Seq(1, 3)) {
      val got = Graphs.labelPropagation(es.toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getAs[Long]("vertex") ->
          r.getAs[Long]("community")).toMap
      assert(got == replay(es, iters), s"iters=$iters")
    }
    // after 3 rounds the cliques hold two distinct communities
    val fin = Graphs.labelPropagation(es.toDF("s", "t"), "s", "t", 3)
      .collect().map(r => r.getAs[Long]("vertex") ->
        r.getAs[Long]("community")).toMap
    assert(Set(fin(1L), fin(2L), fin(3L)).size == 1)
    assert(Set(fin(10L), fin(11L), fin(12L)).size == 1)
    assert(fin(1L) != fin(10L))
  }

  test("labelPropagation property: matches the replay on random graphs; repartition-stable") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
    val cases = (0 until 3).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(307L + i)))
    def replay(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val nbrs = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2) }
      var lbl = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 1 to iters) {
        lbl = nbrs.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
          v -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      lbl
    }
    cases.foreach { raw =>
      val es = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (es.nonEmpty) {
        val got = Graphs.labelPropagation(es.toDF("s", "t"), "s", "t", 2)
          .collect().map(r => r.getAs[Long]("vertex") ->
            r.getAs[Long]("community")).toMap
        assert(got == replay(es, 2), s"edges: $es")
        val shuffled = Graphs.labelPropagation(
            es.toDF("s", "t").repartition(7), "s", "t", 2)
          .collect().map(r => r.getAs[Long]("vertex") ->
            r.getAs[Long]("community")).toMap
        assert(shuffled == got)
      }
    }
  }

  test("kCore: peels to the unique maximal subgraph; cascades handled") {
    // K4 on 1-4 plus a pendant chain 4-5-6: 2-core = the K4 (5 peels
    // first, then 6... actually 6 peels first, then 5 — cascade).
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val out = Graphs.kCore(es.toDF("s", "t"), "s", "t", k = 2)
      .collect().map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("core_deg"))
      .toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=4 collapses everything (max degree in any surviving subgraph < 4)
    assert(Graphs.kCore(es.toDF("s", "t"), "s", "t", k = 4).isEmpty)
    // k=1 keeps the whole graph with original degrees
    val all = Graphs.kCore(es.toDF("s", "t"), "s", "t", k = 1)
      .collect().map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("core_deg"))
      .toMap
    assert(all == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 2L,
      6L -> 1L))
  }

  test("kCore: maxRounds guards the O(V)-round pathology") {
    val chain = (1L to 9L).map(v => (v, v + 1))
    val e = intercept[IllegalArgumentException] {
      Graphs.kCore(chain.toDF("s", "t"), "s", "t", k = 2, maxRounds = 2)
        .collect()
    }
    assert(e.getMessage.contains("maxRounds"))
    // with budget it converges: a pure chain has no 2-core
    assert(Graphs.kCore(chain.toDF("s", "t"), "s", "t", k = 2).isEmpty)
  }

  test("kCore property: matches sequential peel simulation") {
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(1L, 14L), Gen.choose(1L, 14L)))
    val cases = (0 until 4).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(31L + i)))
    cases.foreach { raw =>
      val es = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (es.nonEmpty) {
        var cur = es
        var changed = true
        while (changed) {
          val deg = cur.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (v, o) => v -> o.size }
          val weak = deg.filter(_._2 < 3).keySet
          changed = weak.nonEmpty
          cur = cur.filter(e => !weak(e._1) && !weak(e._2))
        }
        val ref = cur.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
        val got = Graphs.kCore(es.toDF("s", "t"), "s", "t", k = 3)
          .collect()
          .map(r => r.getAs[Long]("vertex") -> r.getAs[Long]("core_deg"))
          .toMap
        assert(got == ref, s"edges: $es")
      }
    }
  }

  test("property: matches brute-force triple enumeration on random graphs") {
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))
    val cases = (0 until 6).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)))
    cases.foreach { raw =>
      val es = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (es.nonEmpty) {
        val vs = es.flatMap(e => Seq(e._1, e._2)).distinct
        val set = es.toSet
        val triRef = vs.combinations(3).count { c =>
          val Seq(a, b, cc0) = c.sorted
          set((a, b)) && set((b, cc0)) && set((a, cc0))
        }
        val (_, _, _, nt, _) = run(es)
        assert(nt == triRef.toLong, s"edges: $es")
      }
    }
  }

  test("hits: hand fixture — two unrolled iterations, max-normalized") {
    import spark.implicits._
    val S = 1000000000000L
    // u1 -> {s1, s2, s3}, u2 -> {s1}; duplicate edge must collapse
    val edges = Seq((1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L),
      (2L, 101L)).toDF("src", "dst")
    val out = Graphs.hits(edges, "src", "dst", iters = 2, scale = S)
      .collect().map(r => r.getAs[Long]("vertex") ->
        ((Option(r.getAs[java.lang.Long]("hub")).map(_.longValue()),
          Option(r.getAs[java.lang.Long]("auth")).map(_.longValue()))))
      .toMap
    // iter1: h(u1)=S, h(u2)=S/3; a(s1)=S, a(s2)=a(s3)=S*S//(4S/3)
    // iter2: hp(u1)=S+2*750e9=2.5e12 -> h(u1)=S, h(u2)=S*S//2.5e12=4e11
    //        ap(s1)=1.4e12 -> a(s1)=S, a(s2)=a(s3)=S*S//1.4e12
    assert(out(1L) == ((Some(S), None)))
    assert(out(2L) == ((Some(400000000000L), None)))
    assert(out(101L) == ((None, Some(S))))
    assert(out(102L) == ((None, Some(714285714285L))))
    assert(out(103L) == ((None, Some(714285714285L))))
  }

  test("personalized pagerank: hand fixture, three exact iterations") {
    import spark.implicits._
    val S = 1000000000000L
    // star: 1 <-> 2, 1 <-> 3; seed {1}
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val out = Graphs.personalizedPageRank(edges, "src", "dst",
        seeds, "v", iters = 3, scale = S)
      .collect().map(r => r.getAs[Long]("vertex") ->
        ((r.getAs[Long]("rank_fp"), r.getAs[Boolean]("is_seed")))).toMap
    // r1: (150e9, 425e9, 425e9); r2: (872.5e9, 63.75e9, 63.75e9);
    // r3: 1 -> 150e9 + 85%*127.5e9 = 258375e6; 2,3 -> 85%*436.25e9
    assert(out(1L) == ((258375000000L, true)))
    assert(out(2L) == ((370812500000L, false)))
    assert(out(3L) == ((370812500000L, false)))
  }

  test("personalized pagerank: isolated seed keeps restart-only mass") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("v")
    val out = Graphs.personalizedPageRank(edges, "src", "dst",
        seeds, "v", iters = 2)
      .collect().map(r => r.getAs[Long]("vertex") ->
        r.getAs[Long]("rank_fp")).toMap
    // 99 never receives inflow: rank = its restart share every round
    assert(out(99L) == 75000000000L) // (1e12*15/100)/2
    assert(out.contains(1L) && out.contains(2L))
  }

  test("degreeMixing: star is exactly r = -1; cycle is degree-regular null") {
    def mix(edges: Seq[(Long, Long)]) = {
      val r = Graphs.degreeMixing(edges.toDF("s", "t"), "s", "t").collect()(0)
      (r.getAs[Long]("n_vertices"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("max_degree"), r.getAs[Long]("mean_degree_milli"),
        Option(r.getAs[Any]("degree_cv2_milli")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("assortativity_milli")).map(_.asInstanceOf[Long]))
    }
    // star 1-{2,3,4}: degrees (3,1,1,1); Newman's canonical perfectly
    // disassortative graph — r = -1 exactly. cv2: sd=6, sx=12 ->
    // 1000*(4*12-36)/36 = 333 (truncated)
    assert(mix(Seq((1L, 2L), (1L, 3L), (1L, 4L))) ==
      ((4L, 3L, 3L, 1500L, Some(333L), Some(-1000L))))
    // 4-cycle: degree-regular -> zero variance -> r null, cv2 = 0
    assert(mix(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      ((4L, 4L, 2L, 2000L, Some(0L), None)))
    // two disjoint K2s joined by nothing: assortative by construction
    // after adding a hub pair: {1-2, 3-4, 1-3}: degrees (2,1,2,1);
    // edges (2,1),(2,1),(2,2): Sx=10, Sx2=18, Sab=2+2+4=8, E=3
    // num = 4*3*8 - 100 = -4; den = 2*3*18 - 100 = 8 ->
    // magnitude 4000 div 8 = 500 -> -500 (truncation toward zero)
    assert(mix(Seq((1L, 2L), (3L, 4L), (1L, 3L)))._6 == Some(-500L))
  }

  test("degreeMixing: direction, duplicates and self-loops are canonicalized away") {
    def mix(edges: Seq[(Long, Long)]) =
      Graphs.degreeMixing(edges.toDF("s", "t"), "s", "t").collect()(0)
        .toSeq
    assert(mix(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (1L, 3L))) ==
      mix(Seq((1L, 2L), (1L, 3L))))
  }

  test("hits: scores are repartition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(20).toLong, 100L + rnd.nextInt(15).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      Graphs.hits(df, "src", "dst", iters = 2)
        .collect().map(r => (r.getAs[Long]("vertex"),
          r.getAs[java.lang.Long]("hub"), r.getAs[java.lang.Long]("auth")))
        .sortBy(_._1).toSeq
    assert(run(edges.toDF("src", "dst").coalesce(1)) ==
      run(edges.toDF("src", "dst").repartition(13)))
  }
}
