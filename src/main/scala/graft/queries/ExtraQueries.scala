package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Second-wave coverage: deterministic collect_list/set, exact percentiles,
  * the engine-safe math-function subset, join-strategy hints, and sampling.
  *
  * Math functions stick to operations with exact IEEE semantics across
  * engines (sqrt, abs, floor/ceil, mod, least/greatest, sign) — pow/log/exp
  * are libm-dependent and can differ in the last ulp, so they are exercised
  * in unit tests instead of the byte-exact oracle.
  */
object ExtraQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_record_linkage" -> { (s, d) =>
      // Fellegi-Sunter record linkage (operators/Linkage): customers vs
      // suppliers as two key-less registries. Blocking on (nation,
      // balance-millibucket) keeps the pair space linear (the documented
      // single-pass recall trade); rules: entity-number edit distance
      // <= 1 through the banded native kernel (+2500/-400 milli-bits)
      // and balance within $100 in EXACT cents (+1200/-300). Two
      // thresholds -> match/possible; non-matches never materialize.
      // All four agreement patterns are live at sf0.01 (2/11/94/432).
      val cents = (c: org.apache.spark.sql.Column) =>
        (c.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2))
          * 100).cast("long")
      val c = Tables.customer(s, d).select(
        col("c_custkey"), substring(col("c_name"), 10, 20).as("c_num"),
        col("c_nationkey").as("c_nk"),
        floor(col("c_acctbal") / 1000).as("c_bk"),
        cents(col("c_acctbal")).as("c_cents"))
      val sup = Tables.supplier(s, d).select(
        col("s_suppkey"), substring(col("s_name"), 10, 20).as("s_num"),
        col("s_nationkey").as("s_nk"),
        floor(col("s_acctbal") / 1000).as("s_bk"),
        cents(col("s_acctbal")).as("s_cents"))
      graft.operators.Linkage.fellegiSunter(
          c, sup,
          blockKeys = Seq("c_nk" -> "s_nk", "c_bk" -> "s_bk"),
          idCols = Seq("c_custkey", "s_suppkey"),
          rules = Seq(
            graft.operators.Linkage.LinkRule("name",
              graft.operators.Linkage.levWithin(col("c_num"), col("s_num"), 1),
              2500L, -400L),
            graft.operators.Linkage.LinkRule("bal",
              abs(col("c_cents") - col("s_cents")) <= 10000L, 1200L, -300L)),
          tLo = 500L, tHi = 2000L)
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },

    "q49_collect_sorted" -> { (s, d) =>
      // collect_list is order-nondeterministic; sort_array makes it a
      // deterministic set-valued aggregation (matching DuckDB's ORDER BY).
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 95000)
        .groupBy(col("o_orderstatus"))
        .agg(
          sort_array(collect_list(col("o_orderkey"))).as("orderkeys"),
          sort_array(collect_set(col("o_orderpriority"))).as("priorities"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          array_join(transform(col("orderkeys"), _.cast("string")), ",").as("orderkeys"),
          array_join(col("priorities"), ",").as("priorities"), col("n"))
        .orderBy(col("o_orderstatus"))
    },

    "q50_percentile_exact" -> { (s, d) =>
      // Exact interpolated percentiles (SQL PERCENTILE_CONT semantics in
      // both engines). Values are raw parquet doubles — no arithmetic, so
      // interpolation (one subtraction/multiply/add) is engine-identical.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"),
          expr("percentile(l_quantity, 0.25)").as("q1_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    "q51_math_funcs" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          abs(col("c_acctbal")).as("abs_bal"),
          sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
          floor(col("c_acctbal")).cast("long").as("floor_bal"),
          ceil(col("c_acctbal")).cast("long").as("ceil_bal"),
          (col("c_custkey") % 7).as("mod7"),
          least(col("c_acctbal"), lit(0.0)).as("min0"),
          greatest(col("c_acctbal"), lit(0.0)).as("max0"),
          signum(col("c_acctbal")).as("sign_bal"))
        .orderBy(col("c_custkey"))
    },

    "q52_join_hints" -> { (s, d) =>
      // Strategy hints: force shuffle-hash on one join, merge on another —
      // results identical to unhinted execution (the oracle checks that).
      val l = Tables.lineitem(s, d).hint("SHUFFLE_HASH")
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).hint("MERGE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("c_mktsegment"))
    },

    // Seeded sampling is engine-specific, so the sample itself can't be
    // hash-compared; instead the plan checks the sample against its own
    // population: sampled fraction within +-1% of N absolute (an ~8-sigma
    // band for Bernoulli p=0.1) and sample-mean quantity within 5% of the
    // population mean (~6 sigma). The oracle reproduces the exact anchors
    // and literal TRUEs. Seed is fixed, so the check is deterministic.
    "q53_sample" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val smp = li.sample(withReplacement = false, 0.1, seed = 42)
        .agg(count(lit(1)).as("n_sampled"), davg(col("l_quantity")).as("smp_avg"))
      val tot = li.agg(count(lit(1)).as("n_total"), davg(col("l_quantity")).as("pop_avg"))
      smp.crossJoin(tot).select(col("n_total"),
        (abs(col("n_sampled") - col("n_total") * 0.1) <= col("n_total") * 0.01).as("frac_ok"),
        (abs(col("smp_avg") - col("pop_avg")) <= col("pop_avg") * 0.05).as("mean_ok"))
    },

    "q55_pivot" -> { (s, d) =>
      // Pivot order status into columns per year (spread/wide-form).
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("long").as("yr"), col("o_orderstatus"))
        .groupBy(col("yr"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("yr"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_full"),
          coalesce(col("P"), lit(0L)).as("n_partial"))
        .orderBy(col("yr"))
    },

    "q56_unpivot" -> { (s, d) =>
      // Unpivot (melt) wide metrics back to long form.
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_custkey").cast("double").as("key_as_metric"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal"), col("key_as_metric")),
          "metric", "value")
        .orderBy(col("c_custkey"), col("metric"))
    },

    "q57_conditional_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count_if(col("o_totalprice") > 50000).as("n_big"),
          dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
            .otherwise(lit(0.0))).as("urgent_total"),
          max_by(col("o_orderkey"), col("o_orderkey")).as("last_orderkey"),
          min_by(col("o_custkey"), col("o_orderkey")).as("first_customer"))
        .orderBy(col("o_orderstatus"))
    },

    "q58_neardup_pipeline" -> { (s, d) =>
      // Flagship LLM-pipeline op end-to-end: MinHash LSH candidates
      // verified by exact Jaccard, thresholded.
      graft.operators.Dedup.nearDupPairs(
          Tables.documents(s, d), "doc_id", "text", threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    },

    "q61_histogram" -> { (s, d) =>
      // Fixed-width binning via integer arithmetic (width_bucket dialects
      // differ; floor-division is engine-identical).
      Tables.events(s, d)
        .groupBy(floor(col("value") / 20.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .withColumn("bin_lo", col("bin") * 20.0)
        .select(col("bin"), col("bin_lo"), col("n"), col("sum_value"))
        .orderBy(col("bin"))
    },

    "q62_exact_moments" -> { (s, d) =>
      // Order-independent variance/stddev: exact decimal sums of x and x²
      // (2-dec inputs → 4-dec squares, both exact), moments assembled in
      // double with a fixed expression tree — bitwise-identical on any
      // engine and ANY partitioning, unlike native stddev/var whose
      // accumulation order varies.
      val x = dec(col("value"))
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sum_x"),
          sum(x * x).cast("double").as("sum_x2"))
        .select(col("event_type"), col("n"),
          (col("sum_x") / col("n")).as("mean"),
          ((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) /
            (col("n") - 1)).as("variance"),
          sqrt((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) /
            (col("n") - 1)).as("stddev"))
        .orderBy(col("event_type"))
    },

    "q60_deduped_corpus" -> { (s, d) =>
      // The actual dedup output: corpus minus greedy near-dup losers.
      graft.operators.Dedup.dropNearDuplicates(
          Tables.documents(s, d), "doc_id", "text", threshold = 0.4)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    "q65_percentile_dist" -> { (s, d) =>
      // q50's exact percentiles through the distributed operator
      // (operators.Percentiles): no per-group value collection — the same
      // oracle proves result parity with the single-reducer built-in.
      val li = Tables.lineitem(s, d)
      val wide = graft.operators.Percentiles.percentileContMultiWide(
        li, "l_returnflag", Seq(
          "l_extendedprice" -> Seq(0.5 -> "p50", 0.95 -> "p95"),
          "l_quantity" -> Seq(0.25 -> "q1_qty")))
      val n = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      wide.join(n, "l_returnflag")
        .select(col("l_returnflag"), col("p50"), col("p95"), col("q1_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    },

    "q71_neardup_clusters" -> { (s, d) =>
      // Transitive near-dup components (min-label propagation) — the
      // cluster-complete dedup labeling; oracle is a recursive-CTE
      // transitive closure over the same verified pair set as q58.
      graft.operators.Dedup.nearDupClusters(
          Tables.documents(s, d), "doc_id", "text", threshold = 0.4)
        .orderBy(col("doc_id"))
    },

    "q76_neardup_clusters_star" -> { (s, d) =>
      // q71's clustering through the large-star/small-star algorithm
      // (O(log n) rounds, diameter-independent) — same verified pair set,
      // same recursive-CTE oracle, so the two CC implementations are
      // pinned to identical labelings on real data.
      val docs = Tables.documents(s, d)
      val pairs = graft.operators.Dedup.nearDupPairs(
          docs, "doc_id", "text", threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      graft.operators.Dedup.connectedComponentsStar(
          docs.select(col("doc_id")), pairs, "doc_id")
        .orderBy(col("doc_id"))
    },

    "q70_percentile_disc" -> { (s, d) =>
      // PERCENTILE_DISC (actual data values, no interpolation) through the
      // same distributed rank machinery as q65.
      graft.operators.Percentiles.percentileDiscMultiWide(
          Tables.lineitem(s, d), "l_returnflag", Seq(
            "l_extendedprice" -> Seq(0.5 -> "d50", 0.95 -> "d95"),
            "l_quantity" -> Seq(0.25 -> "dq1")))
        .select(col("l_returnflag"), col("d50"), col("d95"), col("dq1"))
        .orderBy(col("l_returnflag"))
    },

    "q72_weighted_percentile" -> { (s, d) =>
      // Weighted percentiles (each row counts l_quantity times) on the
      // distributed rank machinery — the semantics of Spark's built-in
      // percentile(v, p, frequency) without its per-group value buffering.
      // The oracle replays cumulative weights + the identical interpolation
      // arithmetic in SQL.
      val li = Tables.lineitem(s, d)
      // One table pass for all three targets: the mixed form computes the
      // CONT pair and the DISC rank from the same sorted weighted counts.
      graft.operators.Percentiles.percentileMixedLong(
          li, "l_returnflag",
          Seq("l_extendedprice" -> Seq((0.5, false), (0.95, false), (0.5, true))),
          weightCol = Some("l_quantity"))
        .groupBy(col("l_returnflag")).agg(
          max(when(col("p") === 0.5 && !col("disc"), col("value"))).as("w50"),
          max(when(col("p") === 0.95 && !col("disc"), col("value"))).as("w95"),
          max(when(col("p") === 0.5 && col("disc"), col("value"))).as("wd50"))
        .orderBy(col("l_returnflag"))
    },

    "q85_corr_regression" -> { (s, d) =>
      // Correlation + simple linear regression per group, derived from
      // exact sufficient statistics. The built-ins (corr, regr_slope)
      // accumulate doubles in engine-specific order — not hash-portable.
      // The five sums run in CENTS-SCALED LONG arithmetic (both columns
      // carry exactly 2 decimals, so round(v*100) is an exact integer in
      // both engines): order-independent, map-side combinable, and ~1.5x
      // the DECIMAL(18,2) formulation this replaced — sum(x*y) over
      // decimals widens past the compact-long backing (precision 37) and
      // pays BigDecimal adds per row, where the cents products stay on
      // primitive longs. Exactness bound: sum(xc*xc) <= n·(5100)², i.e.
      // exact to ~3.5e11 rows PER GROUP — comfortably past a 100 TB
      // lineitem split over 3 return flags. The cents scale cancels in
      // corr and slope; intercept rescales by 100 — one identical IEEE
      // expression tree in both engines, as before.
      val xc = round(col("l_quantity") * 100).cast("long")
      val yc = round(col("l_discount") * 100).cast("long")
      val stats = Tables.lineitem(s, d)
        .select(col("l_returnflag"), xc.as("xc"), yc.as("yc"))
        .groupBy(col("l_returnflag")).agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("xc")).cast("double").as("sxc"),
          sum(col("yc")).cast("double").as("syc"),
          sum(col("xc") * col("yc")).cast("double").as("sxyc"),
          sum(col("xc") * col("xc")).cast("double").as("sxxc"),
          sum(col("yc") * col("yc")).cast("double").as("syyc"))
      val cov = col("n") * col("sxyc") - col("sxc") * col("syc")
      val vx = col("n") * col("sxxc") - col("sxc") * col("sxc")
      val vy = col("n") * col("syyc") - col("syc") * col("syc")
      stats.select(col("l_returnflag"), col("n").cast("long").as("n"),
          (cov / sqrt(vx * vy)).as("corr_qd"),
          (cov / vx).as("slope"),
          ((col("syc") / lit(100.0) - cov / vx * (col("sxc") / lit(100.0)))
            / col("n")).as("intercept"))
        .orderBy(col("l_returnflag"))
    },

    "q86_mode" -> { (s, d) =>
      // Exact mode per group with a deterministic tie-break (highest count,
      // then lexicographically smallest value) — engines' native mode()
      // tie-break is unspecified, so the portable form is count + rank.
      val cnt = Tables.documents(s, d).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      graft.operators.TopK.perGroup(cnt, Seq("source"),
          Seq(col("c").desc, col("lang").asc), 1)
        .select(col("source"), col("lang").as("mode_lang"),
          col("c").as("n_docs"))
        .orderBy(col("source"))
    },

    "q87_profile" -> { (s, d) =>
      // Data-profiling sweep — see graft.operators.Profile (numeric/string
      // dispatch by dtype; per-column pruned scans, driver-side union).
      graft.operators.Profile.profile(Tables.orders(s, d),
          Seq("o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey"))
        .orderBy(col("column_name"))
    },

    "q102_contingency" -> { (s, d) =>
      // Contingency table + chi-square independence cells for lang ×
      // source: the full grid (including zero-observed cells — textbook
      // chi² needs them), expected counts from broadcast marginals, and
      // each cell's (o−e)²/e contribution. Per-cell output (not a global
      // double sum, which would be fold-order-dependent); every value is
      // one identical IEEE expression both engines evaluate bitwise.
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val cells = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val grid = docs.select(col("lang")).distinct()
        .crossJoin(docs.select(col("source")).distinct())
      val rowN = docs.groupBy(col("lang")).agg(count(lit(1)).as("row_n"))
      val colN = docs.groupBy(col("source")).agg(count(lit(1)).as("col_n"))
      val e = (col("row_n") * col("col_n")).cast("double") / lit(n)
      val oD = coalesce(col("o"), lit(0L)).cast("double")
      grid.join(cells, Seq("lang", "source"), "left")
        .join(broadcast(rowN), "lang").join(broadcast(colN), "source")
        .select(col("lang"), col("source"),
          coalesce(col("o"), lit(0L)).as("o"), e.as("e"),
          ((oD - e) * (oD - e) / e).as("contrib"))
        .orderBy(col("lang"), col("source"))
    },

    "q100_winsorize" -> { (s, d) =>
      // Percentile clipping (winsorization): p05/p95 bounds per group from
      // the distributed rank machinery, materialized driver-side
      // (group-count rows, the q90 pattern) and re-applied as a literal
      // map — so the clip pass is a narrow scan, and re-aggregation is
      // one map-side-combinable pass. Bounds are interpolated doubles and
      // least/greatest is exact, so DuckDB replays bitwise.
      val li = Tables.lineitem(s, d)
      val bounds = graft.operators.Percentiles.percentileContWide(
        li, "l_returnflag", "l_extendedprice",
        Seq(0.05 -> "lo", 0.95 -> "hi")).collect()
      val loMap = map(bounds.toSeq.flatMap(r =>
        Seq(lit(r.getString(0)), lit(r.getDouble(1)))): _*)
      val hiMap = map(bounds.toSeq.flatMap(r =>
        Seq(lit(r.getString(0)), lit(r.getDouble(2)))): _*)
      li.select(col("l_returnflag"),
          least(greatest(col("l_extendedprice"),
            element_at(loMap, col("l_returnflag"))),
            element_at(hiMap, col("l_returnflag"))).as("clipped"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("clipped")).as("sum_clipped"),
          min(col("clipped")).as("lo_clipped"),
          max(col("clipped")).as("hi_clipped"))
        .orderBy(col("l_returnflag"))
    },

    "q105_domain_cap" -> { (s, d) =>
      // Per-source frequency capping (the C4-style per-domain cap): keep
      // at most 10 documents per source, chosen by portable-hash order —
      // a deterministic "random" cap that needs no RNG state and survives
      // re-runs and repartitioning. One window shuffle on source; skewed
      // domains split under AQE.
      val h = (col("doc_id") * 1000003L + 17L) % 1000000007L
      val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy(col("doc_id"))
    },

    "q106_zorder" -> { (s, d) =>
      // Z-order (Morton) layout key over (partkey, suppkey) — the
      // multi-dimensional clustering key: range-partition + sort by z and
      // parquet zone maps prune on EITHER column. Here each 256th of the
      // key space reports its bounding box in both dims (what the zone
      // maps would store). Pure codegen'd bitwise arithmetic, replayed
      // bit-for-bit by the oracle.
      val z = graft.functions.Layout.interleaveBits(
        col("l_partkey") % 65536, col("l_suppkey") % 65536)
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 65536).as("pk"),
          (col("l_suppkey") % 65536).as("sk"), z.as("z"))
        .groupBy(shiftright(col("z"), 24).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
          min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))
        .orderBy(col("bucket"))
    },

    "q292_coordinated_sample" -> { (s, d) =>
      // Coordinated-sampling join audit (B119): dev-sampling lineitem
      // and orders INDEPENDENTLY at 10% keeps ~1% of the join (two
      // coins must both land); gating both sides on the SAME hash of
      // the join key keeps the join restricted to the sampled key
      // universe — unbiased 1/p scale-up. One row measures both:
      // the coordinated estimate lands near truth, the naive 1/p²
      // estimate carries the multiplicity variance.
      graft.operators.Sampling.coordinatedJoinAudit(
        Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey", permille = 100)
    },

    "q98_hash_sample" -> { (s, d) =>
      // Deterministic stratified sampling by portable hash-gating — the
      // reproducible sampling a production pipeline ships: stable under
      // re-runs, repartitioning, and engine changes (seeded RNG sampling
      // is engine-specific, which is why q53 is rows-only). Per-stratum
      // rates: en 50%, other languages 20%. Narrow filter, no shuffle.
      val bucket = (col("doc_id") * 1000003L + 17L) % 1000000007L % 100L
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(when(col("lang") === "en", col("bucket") < 50)
          .otherwise(col("bucket") < 20))
        .orderBy(col("doc_id"))
    },

    "q187_cluster_keep_best" -> { (s, d) =>
      // Quality-aware dedup representative: per near-dup cluster (q71's
      // closure), keep the HIGHEST-quality document (q140's hashed-
      // feature score; ties to the lowest id) instead of the blind
      // lowest-id keep-first — what a production pipeline actually
      // ships when near-dups differ in cleanliness. Selection is two
      // map-side-combinable aggregates + a join-back (no window over a
      // possibly-huge cluster).
      val docs = Tables.documents(s, d)
      val clusters = graft.operators.Dedup.nearDupClusters(
        docs, "doc_id", "text", threshold = 0.4)
      val scored = docs.select(col("doc_id"),
        graft.functions.TextFunctions.hashedFeatureScore(col("text"))
          .as("score"))
      val cj = clusters.join(scored, "doc_id")
      val mxs = cj.groupBy(col("cluster_id"))
        .agg(max(col("score")).as("__mx"), count(lit(1)).as("cluster_size"))
      cj.join(mxs, "cluster_id")
        .filter(col("score") === col("__mx"))
        .groupBy(col("cluster_id"), col("__mx"), col("cluster_size"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("cluster_id"), col("__mx").as("score"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
    },

    "q99_cluster_split" -> { (s, d) =>
      // Leakage-safe train/eval split: hash the near-dup CLUSTER id, not
      // the document id, so near-duplicates always land in the same split
      // (the decontamination property an LLM data pipeline needs — a
      // doc-id hash would put a train document's near-copy in eval).
      // Portable polynomial hash → exact oracle on the q71 closure.
      val clusters = graft.operators.Dedup.nearDupClusters(
        Tables.documents(s, d), "doc_id", "text", threshold = 0.4)
      clusters.select(col("doc_id"), col("cluster_id"),
          when((col("cluster_id") * 1000003L + 17L) % 1000000007L % 10L < 8,
            lit("train")).otherwise(lit("eval")).as("split"))
        .orderBy(col("doc_id"))
    },

    "q242_golden_record" -> { (s, d) =>
      // MDM survivorship over near-dup clusters: each cluster's
      // records merge ATTRIBUTE-WISE to the plurality value (ties to
      // the smallest — the q86 mode rule), with a per-attribute
      // conflict ledger. q187 keeps the best whole record; this builds
      // the composite golden one — the other half of entity resolution.
      val docs = Tables.documents(s, d)
      val clusters = graft.operators.Dedup.nearDupClusters(
        docs, "doc_id", "text", threshold = 0.4)
      graft.operators.Survivorship.goldenRecord(
        clusters.join(docs.select(col("doc_id"), col("lang"), col("source")),
          "doc_id"),
        "cluster_id", Seq("lang", "source"))
        .orderBy(col("cluster_id"))
    },

    "q248_fingerprint_clusters" -> { (s, d) =>
      // OpenRefine-style key-collision clustering: documents whose
      // NORMALIZATION key (lowercase, split on non-alnum, dedup, sort,
      // rejoin) collides — token permutations and punctuation noise
      // collapse, a real word change never does. The cheap first pass
      // ahead of the fuzzier edit-distance/LSH stages; 16-byte md5
      // shuffle keys, output bounded by collisions.
      graft.operators.Survivorship.fingerprintClusters(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("fp_hash"))
    },

    "q92_bloom_join" -> { (s, d) =>
      // Manual runtime-filter join: bloom-prefilter the fact side on the
      // selective dimension subset's keys BEFORE the join shuffle — the
      // LAZY scalar-subquery form (the bloom build lives inside the probe
      // plan, nothing executes at plan-build). False positives are
      // removed by the exact join that follows, so the bloom changes the
      // plan — ~90% of fact rows never enter the exchange here — never
      // the result: the oracle is the PLAIN join.
      val small = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      val pre = graft.operators.Joins.bloomPrefilterLazy(
        Tables.lineitem(s, d), col("l_orderkey"),
        small, col("o_orderkey"),
        expectedItems = 100000L, numBits = 800000L)
      pre.join(small, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    },

    "q90_mad" -> { (s, d) =>
      // Median absolute deviation per group: the distributed percentile
      // machinery runs twice (median, then median of |x - med|) — no
      // per-group value buffering at either stage. The medians are
      // MATERIALIZED to the driver between the stages (group-count rows,
      // like the percentile machinery's own subtotal collects): left as a
      // lazy subplan, every pass of the second stage would re-run the
      // whole first-stage computation. abs/subtract are exact IEEE ops,
      // and quantile interpolation is parity-pinned by q65, so DuckDB's
      // nested quantile_cont replay hash-matches.
      val li = Tables.lineitem(s, d)
      val medRows = graft.operators.Percentiles.percentileContWide(
        li, "l_returnflag", "l_extendedprice", Seq(0.5 -> "med")).collect()
      val medMap = map(medRows.toSeq.flatMap(r =>
        Seq(lit(r.getString(0)), lit(r.getDouble(1)))): _*)
      val ad = li.select(col("l_returnflag"),
        abs(col("l_extendedprice") - element_at(medMap, col("l_returnflag")))
          .as("ad"))
      graft.operators.Percentiles.percentileContWide(
          ad, "l_returnflag", "ad", Seq(0.5 -> "mad"))
        .select(col("l_returnflag"),
          element_at(medMap, col("l_returnflag")).as("med"), col("mad"))
        .orderBy(col("l_returnflag"))
    })

  /** Shared by q71 (min-label), q76 (large-star/small-star), and q99
    * (leakage-safe split): the same verified near-dup pair set closed
    * transitively by a recursive CTE.
    */
  // Every non-recursive CTE is AS MATERIALIZED (the q136/q237 lesson,
  // re-learned on q242 at sf1): inlined, DuckDB re-expands the chain
  // inside the recursive `reach` evaluation and the closure that runs
  // in seconds materialized never finishes — measured >240 s inlined
  // vs 7.6 s materialized on the 47k-cluster sf1 corpus.
  private val ClustersCteBody: String =
    s""", banded AS MATERIALIZED (${DedupQueries.BandedCteBody}),
        cand AS MATERIALIZED (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
        inter AS MATERIALIZED (
          SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN ids ia ON ia.doc_id = c.id_a
          JOIN ids ib ON ib.doc_id = c.id_b AND ib.tid = ia.tid
          GROUP BY c.id_a, c.id_b),
        sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM ids GROUP BY doc_id),
        verified AS MATERIALIZED (
          SELECT c.id_a, c.id_b FROM cand c
          LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          JOIN sizes sa ON sa.doc_id = c.id_a
          JOIN sizes sb ON sb.doc_id = c.id_b
          WHERE CAST(coalesce(i.inter, 0) AS DOUBLE)
            / (sa.sz + sb.sz - coalesce(i.inter, 0)) >= 0.4),
        und AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION ALL SELECT id_b, id_a FROM verified),
        reach AS (
          SELECT doc_id AS n, doc_id AS l FROM documents
          UNION
          SELECT u.dst, r.l FROM reach r JOIN und u ON u.src = r.n)"""

  private val NearDupClustersOracle: String =
    DedupQueries.minhashSql(ClustersCteBody,
      "n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id",
      "FROM reach GROUP BY n ORDER BY doc_id")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** q99: the split hash must be over the CLUSTER id, not the doc id —
    * that is the whole leakage guarantee (near-dups co-travel).
    */
  private val ClusterSplitOracle: String =
    DedupQueries.minhashSql(ClustersCteBody,
      """n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id,
        CASE WHEN (min(l) * 1000003 + 17) % 1000000007 % 10 < 8
          THEN 'train' ELSE 'eval' END AS split""",
      "FROM reach GROUP BY n ORDER BY doc_id")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** q187: keep the best-scoring doc per cluster (ties to lowest id). */
  private val KeepBestOracle: String =
    DedupQueries.minhashSql(ClustersCteBody + s""",
        cls AS (
          SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id
          FROM reach GROUP BY n),
        qs AS (
          SELECT doc_id,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ' '), tok ->
                (list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(tok, ''),
                     x -> CAST(unicode(x) AS BIGINT))),
                   (acc, ch) -> (acc * 31 + ch) % ${graft.operators.Dedup.M}) % 1024)
                  * 2654435761 % 1000 - 500)),
              (a, w) -> a + w) AS score
          FROM documents),
        cj AS (SELECT c.doc_id, c.cluster_id, q.score
               FROM cls c JOIN qs q USING (doc_id)),
        mxs AS (SELECT cluster_id, CAST(max(score) AS BIGINT) AS mx,
                  CAST(count(*) AS BIGINT) AS cluster_size
                FROM cj GROUP BY cluster_id)""",
      """CAST(min(cj.doc_id) AS BIGINT) AS doc_id, cj.cluster_id,
         mxs.mx AS score, mxs.cluster_size""",
      """FROM cj JOIN mxs ON mxs.cluster_id = cj.cluster_id AND cj.score = mxs.mx
         GROUP BY cj.cluster_id, mxs.mx, mxs.cluster_size ORDER BY doc_id""")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  /** q242: attribute-wise plurality merge over the q71 closure. */
  private val GoldenRecordOracle: String =
    DedupQueries.minhashSql(ClustersCteBody + """,
        cls AS MATERIALIZED (
          SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster_id
          FROM reach GROUP BY n),
        cd AS MATERIALIZED (
          SELECT c.cluster_id, d.lang, d.source
          FROM cls c JOIN documents d USING (doc_id)),
        nr AS (
          SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_records
          FROM cd GROUP BY 1),
        cl2 AS (
          SELECT cluster_id, lang AS v, count(*) AS c FROM cd
          WHERE lang IS NOT NULL GROUP BY 1, 2),
        wl AS (
          SELECT cluster_id, v,
            CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS nv,
            row_number() OVER (PARTITION BY cluster_id
              ORDER BY c DESC, v) AS rn
          FROM cl2),
        cs2 AS (
          SELECT cluster_id, source AS v, count(*) AS c FROM cd
          WHERE source IS NOT NULL GROUP BY 1, 2),
        ws AS (
          SELECT cluster_id, v,
            CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS nv,
            row_number() OVER (PARTITION BY cluster_id
              ORDER BY c DESC, v) AS rn
          FROM cs2)""",
      """nr.cluster_id, nr.n_records, wl.v AS lang,
         wl.nv AS lang_n_values, ws.v AS source, ws.nv AS source_n_values""",
      """FROM nr
         LEFT JOIN (SELECT * FROM wl WHERE rn = 1) wl
           ON wl.cluster_id = nr.cluster_id
         LEFT JOIN (SELECT * FROM ws WHERE rn = 1) ws
           ON ws.cluster_id = nr.cluster_id
         ORDER BY nr.cluster_id""")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  val oracle: Map[String, String] = Map(
    "q248_fingerprint_clusters" -> """
      WITH fp AS (
        SELECT doc_id, text,
          md5(list_aggregate(list_sort(list_distinct(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> len(x) > 0))), 'string_agg', ' ')) AS fp_hash
        FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL)
      SELECT fp_hash, CAST(count(*) AS BIGINT) AS n_records,
        CAST(count(DISTINCT text) AS BIGINT) AS n_variants,
        min(doc_id) AS canonical_id
      FROM fp GROUP BY 1 HAVING count(*) > 1
      ORDER BY fp_hash""",

    "q242_golden_record" -> GoldenRecordOracle,
    "q187_cluster_keep_best" -> KeepBestOracle,
    "q85_corr_regression" -> """
      WITH t AS (
        SELECT l_returnflag,
          CAST(round(l_quantity * 100) AS BIGINT) AS xc,
          CAST(round(l_discount * 100) AS BIGINT) AS yc
        FROM lineitem),
      s AS (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(xc) AS DOUBLE) AS sxc,
          CAST(sum(yc) AS DOUBLE) AS syc,
          CAST(sum(xc*yc) AS DOUBLE) AS sxyc,
          CAST(sum(xc*xc) AS DOUBLE) AS sxxc,
          CAST(sum(yc*yc) AS DOUBLE) AS syyc
        FROM t GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        (n*sxyc - sxc*syc)
          / sqrt((n*sxxc - sxc*sxc) * (n*syyc - syc*syc)) AS corr_qd,
        (n*sxyc - sxc*syc) / (n*sxxc - sxc*sxc) AS slope,
        (syc/100.0 - (n*sxyc - sxc*syc) / (n*sxxc - sxc*sxc) * (sxc/100.0))
          / n AS intercept
      FROM s ORDER BY l_returnflag""",

    "q86_mode" -> """
      WITH tc AS (
        SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      ranked AS (
        SELECT source, lang, c, row_number() OVER
          (PARTITION BY source ORDER BY c DESC, lang) AS rn FROM tc)
      SELECT source, lang AS mode_lang, c AS n_docs
      FROM ranked WHERE rn = 1 ORDER BY source""",

    "q87_profile" -> """
      SELECT 'o_orderstatus' AS column_name, count(*) AS n_rows,
        count(*) - count(o_orderstatus) AS n_nulls,
        count(DISTINCT o_orderstatus) AS n_distinct,
        CAST(min(o_orderstatus) AS VARCHAR) AS min_val,
        CAST(max(o_orderstatus) AS VARCHAR) AS max_val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        count(DISTINCT o_orderpriority),
        CAST(min(o_orderpriority) AS VARCHAR),
        CAST(max(o_orderpriority) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        count(DISTINCT o_totalprice),
        CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
        CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        count(DISTINCT o_custkey),
        CAST(min(CAST(o_custkey AS DECIMAL(18,2))) AS VARCHAR),
        CAST(max(CAST(o_custkey AS DECIMAL(18,2))) AS VARCHAR) FROM orders
      ORDER BY column_name""",

    "q100_winsorize" -> s"""
      WITH b AS (
        SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.05) AS lo,
          quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY 1),
      c AS (
        SELECT l.l_returnflag,
          least(greatest(l.l_extendedprice, b.lo), b.hi) AS clipped
        FROM lineitem l JOIN b USING (l_returnflag))
      SELECT l_returnflag, count(*) AS n, ${sqlSum("clipped")} AS sum_clipped,
        min(clipped) AS lo_clipped, max(clipped) AS hi_clipped
      FROM c GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q102_contingency" -> """
      WITH cells AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      g AS (
        SELECT a.lang, b.source
        FROM (SELECT DISTINCT lang FROM documents) a
        CROSS JOIN (SELECT DISTINCT source FROM documents) b),
      rt AS (SELECT lang, count(*) AS row_n FROM documents GROUP BY 1),
      ct AS (SELECT source, count(*) AS col_n FROM documents GROUP BY 1),
      tot AS (SELECT count(*) AS n FROM documents)
      SELECT g.lang, g.source, coalesce(c.o, 0) AS o,
        CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.n AS e,
        (CAST(coalesce(c.o, 0) AS DOUBLE)
            - CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.n)
          * (CAST(coalesce(c.o, 0) AS DOUBLE)
            - CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.n)
          / (CAST(rt.row_n * ct.col_n AS DOUBLE) / tot.n) AS contrib
      FROM g
      LEFT JOIN cells c ON c.lang = g.lang AND c.source = g.source
      JOIN rt ON rt.lang = g.lang
      JOIN ct ON ct.source = g.source
      CROSS JOIN tot
      ORDER BY g.lang, g.source""",

    "q105_domain_cap" -> """
      WITH t AS (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY (doc_id * 1000003 + 17) % 1000000007, doc_id) AS rn
        FROM documents)
      SELECT doc_id, source, rn FROM t WHERE rn <= 10 ORDER BY doc_id""",

    "q106_zorder" -> s"""
      WITH t AS (
        SELECT l_partkey % 65536 AS pk, l_suppkey % 65536 AS sk
        FROM lineitem),
      zk AS (
        SELECT pk, sk,
          ${graft.functions.Layout.interleaveBitsSql("pk", "sk")} AS z
        FROM t)
      SELECT z >> 24 AS bucket, count(*) AS n,
        min(pk) AS min_pk, max(pk) AS max_pk,
        min(sk) AS min_sk, max(sk) AS max_sk
      FROM zk GROUP BY 1 ORDER BY bucket""",

    "q292_coordinated_sample" -> {
      val mb = graft.operators.Sampling.mixedBucketSql("k")
      val mb2 = graft.operators.Sampling.mixedBucketSql(
        graft.operators.Sampling.mixedBucketSql("k") + " + 7919")
      def err(est: String) = s"""CASE WHEN n_pairs > 0 THEN
          CASE WHEN $est >= n_pairs
            THEN (CAST($est - n_pairs AS HUGEINT) * 1000000) // n_pairs
            ELSE -((CAST(n_pairs - $est AS HUGEINT) * 1000000) // n_pairs)
          END END"""
      s"""
      WITH lk AS (
        SELECT l_orderkey AS k FROM lineitem WHERE l_orderkey IS NOT NULL),
      rk AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey IS NOT NULL),
      ex AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM lk JOIN rk USING (k)),
      lc AS (SELECT k FROM lk WHERE $mb < 100),
      rc AS (SELECT k FROM rk WHERE $mb < 100),
      co AS (
        SELECT CAST(count(*) AS BIGINT) AS n_coord FROM lc JOIN rc USING (k)),
      rn2 AS (SELECT k FROM rk WHERE $mb2 < 100),
      na AS (
        SELECT CAST(count(*) AS BIGINT) AS n_naive FROM lc JOIN rn2 USING (k)),
      fin AS (
        SELECT n_pairs, n_coord,
          (n_coord * 1000) // 100 AS coord_est,
          n_naive, (n_naive * 1000000) // 10000 AS naive_est
        FROM ex CROSS JOIN co CROSS JOIN na)
      SELECT n_pairs, n_coord, coord_est,
        CAST(${err("coord_est")} AS BIGINT) AS coord_err_ppm,
        n_naive, naive_est,
        CAST(${err("naive_est")} AS BIGINT) AS naive_err_ppm
      FROM fin"""
    },

    "q98_hash_sample" -> """
      WITH t AS (
        SELECT doc_id, lang,
          (doc_id * 1000003 + 17) % 1000000007 % 100 AS bucket
        FROM documents)
      SELECT doc_id, lang, bucket FROM t
      WHERE CASE WHEN lang = 'en' THEN bucket < 50 ELSE bucket < 20 END
      ORDER BY doc_id""",

    "q99_cluster_split" -> ClusterSplitOracle,

    "q92_bloom_join" -> s"""
      SELECT o_orderpriority, count(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 450000
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q90_mad" -> """
      WITH m AS (
        SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        FROM lineitem GROUP BY 1),
      d AS (
        SELECT l.l_returnflag, m.med,
          abs(l.l_extendedprice - m.med) AS ad
        FROM lineitem l JOIN m USING (l_returnflag))
      SELECT l_returnflag, max(med) AS med, quantile_cont(ad, 0.5) AS mad
      FROM d GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q215_record_linkage" -> """
      WITH c AS (
        SELECT c_custkey, substr(c_name, 10) AS c_num, c_nationkey AS nk,
          floor(c_acctbal / 1000) AS bk,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c_cents
        FROM customer),
      s AS (
        SELECT s_suppkey, substr(s_name, 10) AS s_num, s_nationkey AS nk,
          floor(s_acctbal / 1000) AS bk,
          CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS s_cents
        FROM supplier),
      p AS (
        SELECT c.c_custkey, s.s_suppkey,
          levenshtein(c.c_num, s.s_num) <= 1 AS agree_name,
          abs(c.c_cents - s.s_cents) <= 10000 AS agree_bal
        FROM c JOIN s ON c.nk = s.nk AND c.bk = s.bk),
      sc AS (
        SELECT c_custkey, s_suppkey, agree_name, agree_bal,
          (CASE WHEN agree_name THEN 2500 ELSE -400 END
           + CASE WHEN agree_bal THEN 1200 ELSE -300 END) AS score
        FROM p)
      SELECT c_custkey, s_suppkey, agree_name, agree_bal,
        CAST(score AS BIGINT) AS score,
        CASE WHEN score >= 2000 THEN 'match'
             WHEN score >= 500 THEN 'possible' END AS verdict
      FROM sc WHERE score >= 500
      ORDER BY c_custkey, s_suppkey""",

    "q49_collect_sorted" -> """
      SELECT o_orderstatus,
        array_to_string(list_transform(list_sort(list(o_orderkey)),
          x -> CAST(x AS VARCHAR)), ',') AS orderkeys,
        array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
        count(*) AS n
      FROM orders WHERE o_totalprice > 95000
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q50_percentile_exact" -> """
      SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.5) AS p50,
        quantile_cont(l_extendedprice, 0.95) AS p95,
        quantile_cont(l_quantity, 0.25) AS q1_qty,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q65_percentile_dist" -> """
      SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.5) AS p50,
        quantile_cont(l_extendedprice, 0.95) AS p95,
        quantile_cont(l_quantity, 0.25) AS q1_qty,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q70_percentile_disc" -> """
      SELECT l_returnflag,
        quantile_disc(l_extendedprice, 0.5) AS d50,
        quantile_disc(l_extendedprice, 0.95) AS d95,
        quantile_disc(l_quantity, 0.25) AS dq1
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Weighted percentiles: cumulative weights over distinct values, then
    // the exact interpolation arithmetic of the operator ((rhi-pos)*vlo +
    // (pos-rlo)*vhi). CAST(p AS DOUBLE) forces double (not DECIMAL)
    // multiplication so pos matches Spark bit-for-bit.
    "q72_weighted_percentile" -> """
      WITH vals AS (
        SELECT l_returnflag AS k, l_extendedprice AS v,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2),
      cum AS (
        SELECT k, v, w,
          sum(w) OVER (PARTITION BY k ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
          sum(w) OVER (PARTITION BY k) AS n
        FROM vals),
      b AS (
        SELECT k, v, w, cw,
          1.0 + CAST(0.5 AS DOUBLE) * (n - 1) AS pos50,
          1.0 + CAST(0.95 AS DOUBLE) * (n - 1) AS pos95,
          greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT)) AS r50
        FROM cum)
      SELECT k AS l_returnflag,
        CASE WHEN any_value(floor(pos50)) = any_value(ceil(pos50))
          THEN max(CASE WHEN floor(pos50) > cw - w AND floor(pos50) <= cw THEN v END)
          ELSE (any_value(ceil(pos50)) - any_value(pos50))
                 * max(CASE WHEN floor(pos50) > cw - w AND floor(pos50) <= cw THEN v END)
               + (any_value(pos50) - any_value(floor(pos50)))
                 * max(CASE WHEN ceil(pos50) > cw - w AND ceil(pos50) <= cw THEN v END)
        END AS w50,
        CASE WHEN any_value(floor(pos95)) = any_value(ceil(pos95))
          THEN max(CASE WHEN floor(pos95) > cw - w AND floor(pos95) <= cw THEN v END)
          ELSE (any_value(ceil(pos95)) - any_value(pos95))
                 * max(CASE WHEN floor(pos95) > cw - w AND floor(pos95) <= cw THEN v END)
               + (any_value(pos95) - any_value(floor(pos95)))
                 * max(CASE WHEN ceil(pos95) > cw - w AND ceil(pos95) <= cw THEN v END)
        END AS w95,
        max(CASE WHEN r50 > cw - w AND r50 <= cw THEN v END) AS wd50
      FROM b GROUP BY k ORDER BY l_returnflag""",

    "q51_math_funcs" -> """
      SELECT c_custkey,
        abs(c_acctbal) AS abs_bal,
        sqrt(abs(c_acctbal)) AS sqrt_bal,
        CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        c_custkey % 7 AS mod7,
        least(c_acctbal, 0.0) AS min0,
        greatest(c_acctbal, 0.0) AS max0,
        CAST(CASE WHEN c_acctbal > 0 THEN 1.0 WHEN c_acctbal < 0 THEN -1.0
          ELSE 0.0 END AS DOUBLE) AS sign_bal
      FROM customer ORDER BY c_custkey""",

    "q52_join_hints" -> s"""
      SELECT c_mktsegment, count(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q53_sample" -> """
      SELECT count(*) AS n_total, TRUE AS frac_ok, TRUE AS mean_ok
      FROM lineitem""",

    "q55_pivot" -> """
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        count(*) FILTER (o_orderstatus = 'O') AS n_open,
        count(*) FILTER (o_orderstatus = 'F') AS n_full,
        count(*) FILTER (o_orderstatus = 'P') AS n_partial
      FROM orders GROUP BY 1 ORDER BY yr""",

    "q56_unpivot" -> """
      SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'key_as_metric', CAST(c_custkey AS DOUBLE) FROM customer
      ORDER BY c_custkey, metric""",

    "q57_conditional_agg" -> s"""
      SELECT o_orderstatus,
        count(*) FILTER (o_totalprice > 50000) AS n_big,
        CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS urgent_total,
        arg_max(o_orderkey, o_orderkey) AS last_orderkey,
        arg_min(o_custkey, o_orderkey) AS first_customer
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q61_histogram" -> s"""
      SELECT CAST(floor(value / 20.0) AS BIGINT) AS bin,
        CAST(CAST(floor(value / 20.0) AS BIGINT) * 20.0 AS DOUBLE) AS bin_lo,
        count(*) AS n, ${sqlSum("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY bin""",

    "q62_exact_moments" -> """
      WITH m AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
          CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_x2
        FROM events GROUP BY event_type)
      SELECT event_type, n,
        sum_x / n AS mean,
        (sum_x2 - sum_x * sum_x / n) / (n - 1) AS variance,
        sqrt((sum_x2 - sum_x * sum_x / n) / (n - 1)) AS stddev
      FROM m ORDER BY event_type""",

    "q58_neardup_pipeline" ->
      DedupQueries.minhashSql(
        s""", banded AS (${DedupQueries.BandedCteBody}),
          cand AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
          inter AS (
            SELECT c.id_a, c.id_b, count(*) AS inter
            FROM cand c
            JOIN ids ia ON ia.doc_id = c.id_a
            JOIN ids ib ON ib.doc_id = c.id_b AND ib.tid = ia.tid
            GROUP BY c.id_a, c.id_b),
          sizes AS (SELECT doc_id, count(*) AS sz FROM ids GROUP BY doc_id)""",
        """c.id_a, c.id_b,
          CAST(coalesce(i.inter, 0) AS DOUBLE)
            / (sa.sz + sb.sz - coalesce(i.inter, 0)) AS jaccard""",
        """FROM cand c
          LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          JOIN sizes sa ON sa.doc_id = c.id_a
          JOIN sizes sb ON sb.doc_id = c.id_b
          WHERE CAST(coalesce(i.inter, 0) AS DOUBLE)
            / (sa.sz + sb.sz - coalesce(i.inter, 0)) >= 0.4
          ORDER BY c.id_a, c.id_b"""),

    "q71_neardup_clusters" -> NearDupClustersOracle,

    // Same recursive-CTE transitive-closure oracle: the two distributed
    // CC algorithms (min-label q71, large-star/small-star q76) must land
    // on identical cluster labelings.
    "q76_neardup_clusters_star" -> NearDupClustersOracle,

    "q60_deduped_corpus" ->
      DedupQueries.minhashSql(
        s""", banded AS (${DedupQueries.BandedCteBody}),
          cand AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
          inter AS (
            SELECT c.id_a, c.id_b, count(*) AS inter
            FROM cand c
            JOIN ids ia ON ia.doc_id = c.id_a
            JOIN ids ib ON ib.doc_id = c.id_b AND ib.tid = ia.tid
            GROUP BY c.id_a, c.id_b),
          sizes AS (SELECT doc_id, count(*) AS sz FROM ids GROUP BY doc_id),
          losers AS (
            SELECT DISTINCT c.id_b FROM cand c
            LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
            JOIN sizes sa ON sa.doc_id = c.id_a
            JOIN sizes sb ON sb.doc_id = c.id_b
            WHERE CAST(coalesce(i.inter, 0) AS DOUBLE)
              / (sa.sz + sb.sz - coalesce(i.inter, 0)) >= 0.4)""",
        "d.doc_id, d.lang, d.n_chars",
        """FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM losers x WHERE x.id_b = d.doc_id)
          ORDER BY d.doc_id"""))
}
