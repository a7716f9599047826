package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY.md §2 B6): HLL distinct counts and
  * approximate percentiles. Sketch values are implementation-specific, so
  * the driver can't hash-compare them directly; instead each query carries
  * its own tolerance oracle — the exact value is computed in the same plan
  * and the output holds the exact anchors plus `*_ok` booleans asserting
  * the estimate sits inside the sketch's published error bound. The DuckDB
  * oracle reproduces the exact anchors and emits literal TRUE, so the hash
  * check passes iff the estimate is within bound.
  */
object ApproxQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q195_quantile_sketch" -> { (s, d) =>
      // Mergeable quantile summary with the DETERMINISTIC compactor
      // (QuantileSketchAgg — KLL levels, odd-index-keep instead of the
      // randomized coin): one bounded summary per group per partition,
      // map-side combined, values never range-partitioned. Summary
      // content is merge-order-dependent (every sketch's is), so the
      // output carries exact PERCENTILE_DISC anchors plus a boolean
      // asserting the estimate's RANK INTERVAL intersects the target
      // +- the worst-case guarantee 2·(levels+1)·n/k — the q48 anchor
      // pattern with the bound computed from the summary's own shape.
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
      val sk = graft.operators.Percentiles.sketchQuantiles(
        li, "g", "v", Seq(0.5, 0.95, 0.99), k = 512)
      val ranks = sk.join(li, "g")
        .groupBy(col("g"), col("p"), col("est"), col("n"), col("n_levels"))
        .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("__lt"),
          sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("__le"))
      val exact = graft.operators.Percentiles
        .percentileDisc(li, "g", "v", Seq(0.5, 0.95, 0.99))
        .withColumnRenamed("value", "exact_disc")
      ranks.join(exact, Seq("g", "p"))
        .withColumn("__target",
          greatest(lit(1L), ceil(col("p") * col("n")).cast("long")))
        .withColumn("__bound",
          (lit(2.0) * (col("n_levels") + 1) * col("n") / 512.0).cast("long") + 1L)
        .select(col("g"), col("p"), col("n"), col("exact_disc"),
          (col("__lt") + 1L <= col("__target") + col("__bound") &&
            col("__le") >= col("__target") - col("__bound")).as("within_bound"))
        .orderBy(col("g"), col("p"))
    },

    "q214_count_min" -> { (s, d) =>
      // Count-min frequency sketch (Cormode & Muthukrishnan 2005): one
      // pass over the corpus tokens into a 4x2048 mergeable grid, then
      // point estimates for a fixed probe set next to their exact
      // counts. Unlike the KLL/HLL rows, the grid is fully
      // DETERMINISTIC (fixed hash family, commutative adds), so the
      // oracle replays the whole sketch and the estimates hash-compare
      // exactly; never_under pins the one-sided guarantee.
      val probes = Seq("join", "hash", "row", "scan", "filter", "spark",
        "the", "sort")
      val depth = 4; val width = 2048
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .withColumn("tid", graft.operators.Dedup.polyHash(col("tok")))
      val cms = toks.agg(
        graft.operators.TopK.countMin(col("tid"), depth, width).as("cms"))
      val pr = s.range(1).select(
          explode(array(probes.map(lit): _*)).as("token"))
        .withColumn("tid", graft.operators.Dedup.polyHash(col("token")))
      val exact = toks.filter(col("tok").isin(probes: _*))
        .groupBy(col("tok").as("token"))
        .agg(count(lit(1)).as("exact_n"))
      pr.crossJoin(broadcast(cms))
        .withColumn("est_n", graft.operators.TopK.countMinEstimate(
          col("cms"), col("tid"), depth, width))
        .join(exact, Seq("token"))
        .select(col("token"), col("exact_n"), col("est_n"),
          (col("est_n") >= col("exact_n")).as("never_under"))
        .orderBy(col("token"))
    },

    "q267_kmv_setops" -> { (s, d) =>
      // KMV distinct sketches with SET ALGEBRA (Beyer et al. 2007): the
      // audience-overlap readout — per-event-type distinct users, plus
      // pairwise union / Jaccard / INTERSECTION estimates computed from
      // the k=256 sketches alone. Intersection is the op HLL cannot do;
      // count(DISTINCT) pairs would need a per-pair EXPAND. The sketch
      // is fully deterministic (house affine hash + k smallest), so the
      // oracle replays sketches AND estimates exactly; exact anchors
      // ride along (bounded group set) as the q195/q214 audit pattern.
      // One corpus pass per side; all set math on the k-long arrays.
      val k = 256
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"))
      val sk = graft.operators.Sketches.kminNdv(
        ev, Seq("event_type"), "user_id", k)
      val pair = graft.operators.Sketches.pairwiseSetOps(sk, "event_type", k)
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact"))
      pair
        .join(broadcast(exact.select(col("event_type").as("group_a"),
          col("exact").as("exact_a"))), "group_a")
        .join(broadcast(exact.select(col("event_type").as("group_b"),
          col("exact").as("exact_b"))), "group_b")
        .select(col("group_a"), col("group_b"), col("exact_a"),
          col("exact_b"), col("ndv_a"), col("ndv_b"), col("est_union"),
          col("jaccard_ppm"), col("est_intersect"))
        .orderBy(col("group_a"), col("group_b"))
    },

    "q216_sliding_distinct" -> { (s, d) =>
      // Sliding distinct-count series via MERGEABLE hourly partials:
      // distinct users per trailing 6-hour window at hourly ticks. The
      // scale path is per-hour HLL sketches (one combinable corpus
      // aggregate -> a BOUNDED hours table) unioned per tick with
      // hll_union_agg — re-aggregating sketches, never rows, so the
      // trailing window costs 6 KB-sized partials per tick instead of a
      // second (tick, user) shuffle of the corpus. The exact two-phase
      // series stays in-plan as the q47-style anchor (at 100 TB it
      // drops); the output asserts the estimate within the HLL bound.
      val pe = Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
        .distinct()
      val hourly = pe.groupBy(col("h"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val ticks = hourly.select(col("h").as("wstart"))
      def spread(df: DataFrame) = df
        .withColumn("o", explode(sequence(lit(0), lit(5))))
        .withColumn("wstart",
          timestamp_seconds(unix_timestamp(col("h")) + col("o") * 3600L))
      val est = spread(hourly)
        .join(ticks, "wstart") // only observed hours become ticks
        .groupBy(col("wstart"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
      val exact = spread(pe)
        .join(ticks, "wstart")
        .groupBy(col("wstart"))
        .agg(count_distinct(col("user_id")).as("n_exact"))
      est.join(exact, "wstart")
        .select(col("wstart"), col("n_exact"),
          (abs(col("__est") - col("n_exact")) <=
            greatest(lit(5L), (col("n_exact") * 5L) / 100L)).as("within_bound"))
        .orderBy(col("wstart"))
    },

    "q47_approx_distinct" -> { (s, d) =>
      // approx_count_distinct is HLL++ at rsd = 0.05 (default); the bound
      // below is 3 sigma (15% relative) — bias-corrected HLL++ lands
      // within 1-2 sigma in practice.
      //
      // The exact anchors are manual two-phase distincts (distinct pairs,
      // then count per group) joined back on the 5-row group table: two
      // countDistinct columns in one Aggregate make Catalyst EXPAND every
      // input row 3x before the shuffle — 3x the shuffle IO of the whole
      // fact table, the exact cost this engine avoids everywhere else.
      val li = Tables.lineitem(s, d)
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"),
          count(lit(1)).as("n"))
      def exactDistinct(c: String, as: String) =
        li.select(col("l_returnflag"), col(c)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      sketches
        .join(exactDistinct("l_partkey", "exact_parts"), "l_returnflag")
        .join(exactDistinct("l_orderkey", "exact_orders"), "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.15).as("parts_ok"),
          (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.15).as("orders_ok"))
        .orderBy(col("l_returnflag"))
    },

    "q48_approx_percentile" -> { (s, d) =>
      // percentile_approx at accuracy 10000 guarantees rank error
      // eps = 1/accuracy = 1e-4 and returns an actual data element, so the
      // estimate must lie between the exact percentiles at p +- eps.
      // Bound with p +- 5e-4: eps plus rank discretization headroom.
      // All six exact anchors come from ONE array-form percentile call —
      // a single value buffer and one sort, not six (six separate
      // percentile() aggregates each buffered the whole column and made
      // this tolerance check 6x the cost of the q50 cross-check).
      val eps = 5e-4
      val ps = Seq(0.5 - eps, 0.5 + eps, 0.95 - eps, 0.95 + eps,
        0.99 - eps, math.min(1.0, 0.99 + eps))
      Tables.lineitem(s, d)
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("a95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("a99"),
          expr(s"percentile(l_extendedprice, array(${ps.mkString(", ")}))").as("__b"),
          count(lit(1)).as("n"))
        .select(col("n"), col("a50"), col("a95"), col("a99"),
          element_at(col("__b"), 1).as("lo50"), element_at(col("__b"), 2).as("hi50"),
          element_at(col("__b"), 3).as("lo95"), element_at(col("__b"), 4).as("hi95"),
          element_at(col("__b"), 5).as("lo99"), element_at(col("__b"), 6).as("hi99"))
        .select(col("n"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50")).as("p50_ok"),
          (col("a95") >= col("lo95") && col("a95") <= col("hi95")).as("p95_ok"),
          (col("a99") >= col("lo99") && col("a99") <= col("hi99")).as("p99_ok"))
    },

    "q68_hll_sketch" -> { (s, d) =>
      // Mergeable HLL sketches (Apache DataSketches, Spark 4 built-ins) —
      // the 100 TB distinct-count pattern: per-partition/per-day sketches
      // materialize once (here per orderstatus), global answers come from
      // merging BINARY sketch columns, never rescanning the data. Default
      // lgK = 12 → RSE ~1.6%; the 5% bound is ~3 sigma.
      val orders = Tables.orders(s, d)
      val perStatus = orders
        .groupBy(col("o_orderstatus"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          count(lit(1)).as("n"))
      val merged = perStatus.agg(
        count(lit(1)).as("n_groups"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
        sum(col("n")).as("n_orders"))
      val exact = orders.agg(countDistinct(col("o_custkey")).as("exact_customers"))
      merged.crossJoin(exact)
        .select(col("n_groups"), col("n_orders"), col("exact_customers"),
          (abs(col("est") - col("exact_customers")) <= col("exact_customers") * 0.05)
            .as("est_ok"))
    })

  val oracle: Map[String, String] = Map(
    "q195_quantile_sketch" -> """
      WITH s AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem),
      nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY g),
      d AS (
        SELECT g, CAST(0.5 AS DOUBLE) AS p,
          quantile_disc(v, 0.5) AS exact_disc FROM s GROUP BY g
        UNION ALL
        SELECT g, CAST(0.95 AS DOUBLE), quantile_disc(v, 0.95) FROM s GROUP BY g
        UNION ALL
        SELECT g, CAST(0.99 AS DOUBLE), quantile_disc(v, 0.99) FROM s GROUP BY g)
      SELECT d.g, d.p, nn.n, d.exact_disc, TRUE AS within_bound
      FROM d JOIN nn USING (g) ORDER BY g, p""",

    "q216_sliding_distinct" -> """
      WITH pe AS (
        SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
          user_id
        FROM events),
      ticks AS (SELECT DISTINCT h AS wstart FROM pe),
      sp AS (
        SELECT CAST(to_timestamp(epoch(h) + o * 3600) AS TIMESTAMP) AS wstart,
          user_id
        FROM pe CROSS JOIN (SELECT unnest([0,1,2,3,4,5]) AS o) os)
      SELECT sp.wstart, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        TRUE AS within_bound
      FROM sp JOIN ticks ON sp.wstart = ticks.wstart
      GROUP BY sp.wstart ORDER BY sp.wstart""",

    "q267_kmv_setops" -> """
      WITH u AS (
        SELECT DISTINCT event_type AS g,
          ((user_id * 1000003 + 17) % 1000000007
            + 1000000007) % 1000000007 AS h
        FROM events WHERE user_id IS NOT NULL),
      rk AS (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM u),
      kk AS (SELECT g, h FROM rk WHERE rn <= 256),
      sz AS (
        SELECT g, CAST(count(*) AS BIGINT) AS m, max(h) AS hk
        FROM kk GROUP BY g),
      est AS (
        SELECT g, CASE WHEN m < 256 THEN m
          ELSE (CAST(255 AS BIGINT) * 1000000007) // hk END AS est
        FROM sz),
      ex AS (
        SELECT event_type AS g,
          CAST(count(DISTINCT user_id) AS BIGINT) AS exact
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      pairs AS (SELECT a.g AS ga, b.g AS gb
        FROM est a JOIN est b ON a.g < b.g),
      uh AS (
        SELECT p.ga, p.gb, k.h,
          max(CASE WHEN k.g = p.ga THEN 1 ELSE 0 END) AS in_a,
          max(CASE WHEN k.g = p.gb THEN 1 ELSE 0 END) AS in_b
        FROM pairs p JOIN kk k ON k.g = p.ga OR k.g = p.gb
        GROUP BY 1, 2, 3),
      uk AS (
        SELECT ga, gb, h, in_a, in_b,
          row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        FROM uh),
      ua AS (
        SELECT ga, gb, CAST(count(*) AS BIGINT) AS usz, max(h) AS hk,
          CAST(sum(in_a * in_b) AS BIGINT) AS common
        FROM uk WHERE rn <= 256 GROUP BY 1, 2),
      fin AS (
        SELECT ga, gb, usz, common,
          CASE WHEN usz < 256 THEN usz
            ELSE (CAST(255 AS BIGINT) * 1000000007) // hk END AS est_union
        FROM ua)
      SELECT f.ga AS group_a, f.gb AS group_b,
        xa.exact AS exact_a, xb.exact AS exact_b,
        ea.est AS ndv_a, eb.est AS ndv_b,
        CAST(f.est_union AS BIGINT) AS est_union,
        CAST((f.common * 1000000) // f.usz AS BIGINT) AS jaccard_ppm,
        CAST((f.est_union * f.common) // f.usz AS BIGINT) AS est_intersect
      FROM fin f
      JOIN est ea ON ea.g = f.ga JOIN est eb ON eb.g = f.gb
      JOIN ex xa ON xa.g = f.ga JOIN ex xb ON xb.g = f.gb
      ORDER BY group_a, group_b""",

    "q214_count_min" -> {
      val m = graft.operators.Dedup.M
      val params = graft.operators.Dedup.hashParams(4).zipWithIndex
        .map { case ((a, b), i) => s"($i, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val probeVals = Seq("join", "hash", "row", "scan", "filter", "spark",
        "the", "sort").map(p => s"('$p')").mkString(", ")
      s"""
      WITH toks AS (
        SELECT t AS tok,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(t, ''),
              x -> CAST(unicode(x) AS BIGINT))),
            (acc, c) -> (acc * 31 + c) % $m) AS tid
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
      params AS (SELECT * FROM (VALUES $params) t(i, a, b)),
      grid AS (
        SELECT p.i, ((p.a * t.tid + p.b) % $m) % 2048 AS bkt,
          CAST(count(*) AS BIGINT) AS n
        FROM toks t CROSS JOIN params p GROUP BY 1, 2),
      probes AS (
        SELECT t AS token,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(t, ''),
              x -> CAST(unicode(x) AS BIGINT))),
            (acc, c) -> (acc * 31 + c) % $m) AS tid
        FROM (VALUES $probeVals) v(t)),
      est AS (
        SELECT pr.token, CAST(min(coalesce(g.n, 0)) AS BIGINT) AS est_n
        FROM probes pr CROSS JOIN params p
        LEFT JOIN grid g
          ON g.i = p.i AND g.bkt = ((p.a * pr.tid + p.b) % $m) % 2048
        GROUP BY 1),
      exact AS (
        SELECT tok AS token, CAST(count(*) AS BIGINT) AS exact_n
        FROM toks
        WHERE tok IN ('join', 'hash', 'row', 'scan', 'filter', 'spark',
          'the', 'sort')
        GROUP BY 1)
      SELECT e.token, exact_n, est_n, est_n >= exact_n AS never_under
      FROM est e JOIN exact USING (token)
      ORDER BY token"""
    },

    "q47_approx_distinct" ->
      """SELECT l_returnflag, count(*) AS n,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_ok, TRUE AS orders_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q48_approx_percentile" ->
      """SELECT count(*) AS n, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM lineitem""".stripMargin,
    "q68_hll_sketch" ->
      """SELECT count(DISTINCT o_orderstatus) AS n_groups,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS est_ok
        |FROM orders""".stripMargin)
}
