package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Plan-shape regression tests: the properties that matter at 100 TB —
  * broadcast dimension joins, filter pushdown into scans, bounded shuffle
  * counts — asserted on the actual physical plans so a refactor that
  * silently degrades a plan fails CI, not the cluster.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    Seq(expanded) ++ expanded.children.flatMap(collectAll) ++
      expanded.subqueries.flatMap(collectAll)
  }

  private def countShuffles(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[ShuffleExchangeExec])

  private def countBroadcasts(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[BroadcastExchangeExec])

  test("global plan audit: no cartesian, no raw-input global window — EVERY query") {
    // The generalization of every per-query pin below: across the WHOLE
    // 200-query surface, (1) no CartesianProduct may appear — a small
    // side must ride a broadcast NLJ instead; (2) any WindowExec without
    // a partition key must sit over provably bounded input: an
    // aggregate (bucket/domain totals), a limit/TakeOrdered (k-row
    // seeds), or a named bounded-table exception. A new query that
    // accidentally plans a corpus-global sort-window fails CI here even
    // without a dedicated pin.
    val windowExceptions: Map[String, String] = Map(
      // iterations run over a localCheckpoint'ed k-row DOMAIN table —
      // bounded by construction (the Doremi contract), but the plan
      // shows only an RDD scan, so boundedness is not inferable here
      "q153_doremi_weights" -> "checkpointed k-row domain table",
      "q156_mixture_pack_pipeline" -> "checkpointed k-row domain table",
      "q184_token_waterfill" -> "source-level table, one row per source",
      "q185_curation_pipeline_v3" -> "source-level waterfill table",
      // the deliberate BUILT-IN ntile cross-check; the scale path is
      // q199 (two-phase rank + exact ntile arithmetic, same oracle)
      "q95_decile_stats" -> "built-in ntile cross-check, scale path q199")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = try plan(name) catch {
        case e: Exception =>
          failures += s"$name: plan build failed: ${e.getMessage}"; null
      }
      if (p != null) {
        val nodes = collectAll(p)
        if (nodes.exists(_.getClass.getSimpleName.startsWith("CartesianProduct")))
          failures += s"$name: CartesianProduct in plan"
        val rawGlobalWindows = nodes.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty &&
                !collectAll(w.child).exists(c =>
                  // any full aggregate bounds the window's input (hash,
                  // sort — struct min/max buffers plan as SortAggregate —
                  // or object-hash)
                  c.toString.contains("HashAggregate") ||
                    c.toString.contains("SortAggregate") ||
                    c.toString.contains("ObjectHashAggregate") ||
                    c.getClass.getSimpleName.contains("Limit") ||
                    c.getClass.getSimpleName.contains("TakeOrdered")) => w
        }
        if (rawGlobalWindows.nonEmpty && !windowExceptions.contains(name))
          failures += s"$name: unpartitioned window over unbounded input"
      }
    }
    assert(failures.isEmpty, s"plan audit failures:\n${failures.mkString("\n")}")
  }

  test("q03: all four dimension joins broadcast; fact side never shuffles pre-agg") {
    val p = plan("q03_revenue_by_nation")
    assert(countBroadcasts(p) == 4, s"expected 4 broadcasts:\n$p")
    // shuffles: one for the aggregation, one for the final orderBy — never
    // a join shuffle of the fact table
    assert(countShuffles(p) <= 2, s"expected <=2 shuffles:\n$p")
  }

  test("q01: single aggregation pass (partial+final = 1 shuffle) + sort") {
    val p = plan("q01_pricing_summary")
    assert(countShuffles(p) <= 2, s"expected agg+sort shuffles only:\n$p")
    assert(p.toString.contains("HashAggregate"), "hash aggregation expected")
  }

  test("q02: predicates and projection reach the parquet scan") {
    val s = plan("q02_filter_pushdown").toString
    assert(s.contains("PushedFilters: [IsNotNull(p_size)") || s.contains("GreaterThanOrEqual(p_size,10)"),
      s"filters not pushed:\n$s")
    assert(!s.contains("p_retailprice:double,p_type"),
      "ReadSchema should prune to selected+filtered columns only")
  }

  test("asof join (q29) plans with bounded shuffles (union + one window sort)") {
    val p = plan("q29_asof_join")
    // union of two scans → window partitionBy shuffle (+AQE may add sort);
    // final orderBy. No join exchange at all.
    assert(countShuffles(p) <= 4, s"asof join must stay shuffle-bounded:\n$p")
    assert(!p.toString.contains("CartesianProduct"), "no pointwise join")
  }

  test("ANN brute force (q41): corpus side scans once, queries broadcast") {
    val p = plan("q41_ann_bruteforce")
    assert(countBroadcasts(p) >= 1, s"query side must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct") ||
      p.toString.contains("BroadcastNestedLoopJoin"),
      s"corpus must not shuffle for the cross join:\n$p")
  }

  test("record pipeline (q31) is wholly narrow: zero shuffles before sort") {
    val p = plan("q31_record_pipeline")
    // only the final orderBy (for the deterministic oracle) may exchange
    assert(countShuffles(p) <= 1, s"kaflow-surface pipeline must not shuffle:\n$p")
  }

  test("narrow minhash (q67): no shuffle except the oracle orderBy") {
    val p = plan("q67_minhash_narrow")
    assert(countShuffles(p) <= 1, s"signature must be a projection:\n$p")
    assert(!p.toString.contains("Generate"), s"no explode in the narrow path:\n$p")
  }

  test("simhash kernel (q39): no explode, no distinct exchange, no wide agg") {
    val p = plan("q39_simhash")
    assert(countShuffles(p) <= 1, s"kernel form must not shuffle pre-sort:\n$p")
    assert(!p.toString.contains("Generate"), s"no explode:\n$p")
  }

  test("bounded top-k (q69): hash aggregate with partial merge, no window") {
    val p = plan("q69_topk_agg")
    val s = p.toString
    assert(s.contains("topk_agg"), s"aggregate missing:\n$s")
    assert(!s.contains("Window"), s"no window fallback:\n$s")
    // partial (map-side) + final: the aggregate appears in two stages
    assert("partial_topk_agg|merge_topk_agg|ObjectHashAggregate".r
      .findFirstIn(s).isDefined, s"expected two-phase aggregate:\n$s")
  }

  test("native cleaning (q115): wholly narrow, inside WholeStageCodegen") {
    val p = plan("q115_text_clean_native")
    assert(countShuffles(p) <= 1, s"cleaning must be map-side only:\n$p")
    assert(p.toString.contains("clean_tokens"), s"native kernel missing:\n$p")
    // AQE hides codegen collapse until runtime; disable to see the spans.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val static = plan("q115_text_clean_native")
      val wscg = collectAll(static).collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(wscg.exists(_.collect {
        case n if n.toString.contains("clean_tokens") => n
      }.nonEmpty), s"kernel must fuse into codegen:\n$static")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("containment (q94): pairs×inter left join broadcasts its build side") {
    // Regression for a silently-dropped hint: broadcast() on the PRESERVED
    // side of a left-outer join cannot build-left, so Spark discarded it
    // (HintErrorLogger warned on every run) and the final pairs×inter join
    // planned as a shuffle. The hint now sits on `inter` (bounded by the
    // pair count) — assert the LeftOuter join actually rides a broadcast.
    val p = plan("q94_containment")
    val leftOuterBhj = collectAll(p).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
    }
    assert(leftOuterBhj.nonEmpty,
      s"pairs LEFT JOIN inter must be a BroadcastHashJoin:\n$p")
    assert(!p.toString.contains("SortMergeJoin(LeftOuter") &&
      !p.toString.contains("SortMergeJoin LeftOuter"),
      s"the left-outer pairs join must not shuffle:\n$p")
  }

  test("naive bayes (q289): every model table broadcasts; the eval pass never sort-merges") {
    // the model is three cardinality-bounded contingency tables + the
    // 1-row priors + three 1-row vocab counts — ALL must ride
    // broadcasts; a SortMergeJoin would mean the corpus-sized eval
    // side is being shuffled once per feature
    val p = plan("q289_naive_bayes_gate")
    assert(countBroadcasts(p) >= 7,
      s"3 contingency + priors + 3 vocab tables must broadcast:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"the eval pass must not shuffle per feature:\n$p")
  }

  test("seq patterns (q300): one entity-partitioned running window, never an unbounded-FOLLOWING frame") {
    // the single-pass claim: all k next-occurrence columns ride ONE
    // WindowExec (same window spec), and the frame is the incremental
    // [unbounded preceding, 1 preceding] — an unbounded-FOLLOWING
    // frame would recompute per row (O(n²) per entity partition).
    // The outer q300 plan hides this stage behind the stats
    // localCheckpoint, so the pin targets the internal fragment; the
    // outer plan is separately pinned join- and window-free (pure
    // checkpoint-scan assembly, the fdStrength shape).
    val ev = graft.Tables.events(spark, dir)
    val inner = graft.operators.SeqPatterns.nextOccurrenceGrid(
        ev, "user_id", "ts", "event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .queryExecution.executedPlan
    val wins = collectAll(inner).filter(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(wins.size == 1,
      s"expected exactly one WindowExec, got ${wins.size}:\n$inner")
    assert(!inner.toString.toLowerCase.contains("unboundedfollowing"),
      s"the next-occurrence frame must not be unbounded-following:\n$inner")
    val outer = plan("q300_seq_patterns")
    assert(!outer.toString.contains("Join") &&
      collectAll(outer).forall(
        !_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"the outer plan must be checkpoint-scan assembly only:\n$outer")
  }

  test("seq funnel discovery (q302): the outer plan is checkpoint-scan assembly, no unbounded-FOLLOWING frame anywhere") {
    // the two stacked window passes live behind the stats checkpoint
    // (same as q300); the outer plan must stay join- and window-free,
    // and no plan fragment may ever use an unbounded-FOLLOWING frame
    val outer = plan("q302_seq_funnel_discovery")
    assert(!outer.toString.contains("Join") &&
      collectAll(outer).forall(
        !_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"the outer plan must be checkpoint-scan assembly only:\n$outer")
    assert(!outer.toString.toLowerCase.contains("unboundedfollowing"))
  }

  test("dbscan census (q301): bounded cell tables broadcast, no pair space anywhere") {
    val p = plan("q301_dbscan_census")
    assert(!p.toString.contains("CartesianProduct"),
      s"no point-pair or cell-pair join may exist:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"cell tables are bounded — every join must broadcast:\n$p")
    assert(countBroadcasts(p) >= 2,
      s"cell/flag tables + total must ride broadcasts:\n$p")
  }

  test("funnel drop-off (q304): outer plan is checkpoint-scan assembly, no unbounded-FOLLOWING frame") {
    // the q302 shape: both window passes (next-occurrence + the
    // gap/any flagged-b mins) hide behind the stats localCheckpoint;
    // the outer plan must stay join- and window-free, and nothing may
    // use an unbounded-FOLLOWING frame
    val outer = plan("q304_funnel_dropoff")
    assert(!outer.toString.contains("Join") &&
      collectAll(outer).forall(
        !_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"the outer plan must be checkpoint-scan assembly only:\n$outer")
    assert(!outer.toString.toLowerCase.contains("unboundedfollowing"))
  }

  test("dbscan clusters (q303): bounded cell tables broadcast, no pair space, corpus never joined back") {
    // the q301 contract carried through the clustering: adjacency, CC
    // labels, and the census all run on the core-cell table; the only
    // corpus pass is the quantize+cell aggregate (behind its
    // localCheckpoint), so the outer plan has no SortMergeJoin and no
    // cartesian anywhere
    val p = plan("q303_dbscan_clusters")
    assert(!p.toString.contains("CartesianProduct"),
      s"no point-pair or cell-pair join may exist:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"cell tables are bounded — every join must broadcast:\n$p")
    // the adjacency joins live behind the CC iteration checkpoints;
    // the label->census join is the one visible here and must broadcast
    assert(countBroadcasts(p) >= 1,
      s"the label join must ride a broadcast:\n$p")
  }

  test("markov accuracy (q291): the K²-bounded model broadcasts to the holdout") {
    val p = plan("q291_markov_accuracy")
    assert(countBroadcasts(p) >= 2,
      s"per-state argmax + global baseline must broadcast:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"the holdout join must not shuffle on the transition table:\n$p")
  }

  test("decontamination (q116): bench side broadcasts, no pair explosion") {
    val p = plan("q116_decontamination")
    assert(countBroadcasts(p) >= 1, s"bench tids must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no corpus-wide pointwise join:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for the bench join:\n$p")
  }

  test("mixture apply (q117): weight table broadcasts, corpus stays narrow") {
    val p = plan("q117_mixture_apply")
    assert(countBroadcasts(p) >= 1, s"weight table must broadcast:\n$p")
    // shuffles: the per-source agg (+AQE variants) and the final orderBy —
    // never a corpus-side join exchange.
    assert(!p.toString.contains("SortMergeJoin"),
      s"corpus must not shuffle into the weight join:\n$p")
  }

  test("IVF fixed (q66): corpus assignment is narrow; probes broadcast") {
    val p = plan("q66_ann_ivf")
    assert(countBroadcasts(p) >= 1, s"probed queries must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"candidate join must be the cell equi-join:\n$p")
  }

  test("distributed percentile (q65): range-partitioned, no single-partition data exchange") {
    val p = plan("q65_percentile_dist")
    val s = p.toString
    assert(s.contains("rangepartitioning"), s"expected a range exchange:\n$s")
    // the only SinglePartition appearances may be the tiny driver-built
    // targets table and the final 3-row orderBy — never the counts table
    val offenders = collectAll(p).filter { n =>
      n.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] &&
        n.asInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]
          .outputPartitioning.numPartitions == 1 &&
        n.toString.contains("__v") // the data path carries the value column
    }
    assert(offenders.isEmpty, s"value table must never centralize:\n$offenders")
  }

  test("dedup pipelines reuse shared shuffles at runtime instead of caching") {
    // The library-level persists were removed on the claim that identical
    // subplans share their exchange; pin the claim on the executed plans
    // (AQE dedupes stages at runtime — reuse is invisible pre-execution).
    // q141: the DSIR model pass and scoring pass both read the same
    // per-(doc, bucket) histogram; __is_t rides as an aggregated column
    // precisely so the scoring filter can't be pushed below the
    // aggregate — both subtrees stay identical and the corpus is
    // scanned once.
    // q158: the movers cut and the L1 sum both read the same per-token
    // aggregate — the tagged union must be scanned once.
    // q160: four bounded sub-aggregates all read the same
    // (lang, source, text-hash) pre-aggregate — one corpus scan.
    for ((q, minReuse) <- Seq("q38_lsh_pairs" -> 1, "q40_ngram_jaccard" -> 2,
        "q141_dsir_importance" -> 1, "q158_token_drift" -> 1,
        "q160_corpus_datasheet" -> 2)) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.treeString
      val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(p).length
      assert(reused >= minReuse, s"$q expected >= $minReuse reused exchanges:\n$p")
    }
  }

  test("custom merge execs run inside WholeStageCodegen (q54 range, q59 asof)") {
    // With AQE on, codegen collapse happens per-stage at runtime; disable it
    // here so the static plan exposes the WholeStageCodegen wrapping.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((q, exec) <- Seq("q54_range_join_custom" -> "RangeJoin",
          "q59_asof_join_custom" -> "AsofJoin")) {
        val p = plan(q)
        val wscg = collectAll(p).collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
        assert(wscg.exists(_.collect { case n if n.nodeName.contains(exec) => n }.nonEmpty),
          s"$q: $exec must be wrapped in WholeStageCodegen:\n$p")
        // and the generated path computes the same rows as the oracle run
        assert(SparkEntry.queries(q)(spark, dir).count() > 0)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("manual bloom prefilter (q92) filters the fact scan; bounded top-k agg in q88") {
    // q92: Joins.bloomPrefilter must show up as a might_contain filter on
    // the lineitem side BEFORE the join.
    val p92 = plan("q92_bloom_join").toString
    assert(p92.contains("might_contain"),
      s"q92 must filter the fact side with might_contain:\n$p92")
    // q88: posting lists must be bounded by the top-k aggregate, never an
    // unbounded per-term collect of raw postings.
    val p88 = plan("q88_inverted_index").toString
    assert(p88.contains("topk_agg"),
      s"q88 postings must go through the bounded top-k aggregate:\n$p88")
    // q101: centroid sums ride the native fixed-point aggregate (one
    // buffer per group-partition), not an exploded per-dim shuffle.
    val p101 = plan("q101_label_centroids").toString
    assert(p101.contains("fixed_point_vector_sum"),
      s"q101 must use the native vector-sum aggregate:\n$p101")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions._
    // A selective dimension filter on a SHUFFLE join (broadcast disabled)
    // should inject a bloom filter on the fact side, so fact rows that
    // cannot match are dropped at the scan, before the exchange — at 100 TB
    // this is the difference between shuffling the full fact table and
    // shuffling the matching slice.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
      val li = Tables.lineitem(spark, dir)
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val s = joined.queryExecution.executedPlan.toString
      assert(s.contains("bloom_filter") || s.contains("BloomFilter"),
        s"bloom filter not injected:\n$s")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("boilerplate (q120): one shingle pass at runtime, no window, no self-join") {
    val df = SparkEntry.queries("q120_boilerplate")(spark, dir)
    df.collect() // finalize the adaptive plan so stage reuse is visible
    val p = df.queryExecution.executedPlan
    val s = p.toString
    // phrase document-frequency must be an aggregate + join-back, never a
    // window over the tid partition: a boilerplate phrase IS a hot key,
    // and a window would buffer ~n_docs rows in one task
    assert(!s.contains("Window"),
      s"skew-unsafe window in the phrase-frequency path:\n$s")
    // the occ and dfreq branches are canonically identical up to the
    // (tid, doc) exchange, so AQE must REUSE that stage — exactly one
    // shingle explode executes even though two appear pre-runtime
    assert(s.contains("ReusedExchange") || s.contains("ReusedQueryStage"),
      s"dfreq branch must reuse the occ exchange (one shingle pass):\n$s")
  }

  test("vocab coverage (q127): bounded top-N cut — no full-vocabulary window") {
    val p = plan("q127_vocab_coverage")
    val all = collectAll(p)
    // the global cut must be a distributed bounded heap, not a sort
    assert(all.exists(_.getClass.getSimpleName == "TakeOrderedAndProjectExec"),
      s"top-N must plan as TakeOrderedAndProject:\n$p")
    // every window (the rank/cumsum pass) must sit ABOVE the top-N cut,
    // i.e. see <= topN rows — mirror of the q129 bucket-totals pin
    def subtreeHasLimit(n: SparkPlan): Boolean =
      collectAll(n).exists(c =>
        c.getClass.getSimpleName == "TakeOrderedAndProjectExec" ||
          c.getClass.getSimpleName.startsWith("GlobalLimit"))
    val badWindows = all.filter(_.getClass.getSimpleName == "WindowExec")
      .filterNot(w => w.children.forall(subtreeHasLimit))
    assert(badWindows.isEmpty,
      s"window over unbounded (vocabulary-sized) input:\n$badWindows")
  }

  test("bpe symbol histogram (q137): native encode kernel, top-N as TakeOrdered") {
    val p = plan("q137_bpe_symbol_freqs")
    val s = p.toString
    // the corpus-wide encode must be the codegen'd kernel, not the
    // interpreted per-merge HOF fold chain
    assert(s.contains("bpe_encode"), s"native encode missing:\n$s")
    assert(!s.contains("aggregate(lambda"),
      s"interpreted HOF fold leaked into the corpus path:\n$s")
    // the top-20 cut is a distributed bounded heap, not a global sort
    assert(collectAll(p).exists(
      _.getClass.getSimpleName == "TakeOrderedAndProjectExec"),
      s"top-N must plan as TakeOrderedAndProject:\n$p")
  }

  test("bm25 (q133): query tables broadcast, bounded top-k cut, no corpus window") {
    val p = plan("q133_bm25_topk")
    val s = p.toString
    // query vocabulary, df table, query terms, and corpus stats all ride
    // broadcasts — the corpus side is never shuffled for them
    assert(countBroadcasts(p) >= 3, s"query-side tables must broadcast:\n$p")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // the per-query cut is the bounded aggregate, not a window sort over
    // every matching document
    assert(s.contains("topk_agg"), s"bounded top-k aggregate missing:\n$s")
    assert(!s.contains("Window"), s"no window fallback in the cut:\n$s")
  }

  test("exact substring spans (q132): agg+join dup detection, windows per-document only") {
    val p = plan("q132_exact_substring_spans")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // gram duplication must be groupBy + join-back (combine-safe on the
    // hot boilerplate grams); the only windows are the per-DOCUMENT
    // gaps-and-islands pair — both partitioned, never corpus-global
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in the span-merge path:\n$s")
  }

  test("sequence packing (q121): bucket prefixes broadcast, bounded exchanges") {
    val p = plan("q121_seq_pack")
    assert(countBroadcasts(p) >= 1, s"prefix table must broadcast:\n$p")
    assert(countShuffles(p) <= 6, s"bounded exchanges expected:\n$p")
  }

  test("LM scoring (q122): all three model tables broadcast") {
    val p = plan("q122_lm_score")
    assert(countBroadcasts(p) >= 3,
      s"bigram, prefix, and vocab tables must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"1-row vocab cross join must be a broadcast NLJ:\n$p")
  }

  test("k-means (q123): both assignment passes are narrow broadcast folds") {
    val p = plan("q123_kmeans")
    val bnlj = collectAll(p)
      .count(_.getClass.getSimpleName == "BroadcastNestedLoopJoinExec")
    assert(bnlj == 2, s"expected 2 broadcast centroid-array joins, got $bnlj:\n$p")
    assert(!p.toString.contains("SortMergeJoin") &&
      !p.toString.contains("CartesianProduct"),
      s"assignment must never shuffle or go cartesian:\n$p")
  }

  test("semdedup (q124): the in-cell pair join is an equi-join, never cartesian") {
    val p = plan("q124_semdedup")
    assert(!p.toString.contains("CartesianProduct"),
      s"cell pair join must stay an equi-join:\n$p")
  }

  test("int8 quantization (q125): wholly narrow — only the oracle sort exchanges") {
    val p = plan("q125_int8_quant")
    assert(countShuffles(p) <= 1, s"quantization must be a projection:\n$p")
    val generates = collectAll(p).count(_.getClass.getSimpleName == "GenerateExec")
    assert(generates == 0, s"no explode in the quantization path:\n$p")
  }

  test("curation pipeline (q126): gates broadcast their model tables, no cartesian") {
    val p = plan("q126_curation_pipeline")
    assert(countBroadcasts(p) >= 3, s"LM model tables must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("CDC chunking (q128): one token explode, bounded exchanges") {
    val p = plan("q128_cdc_chunks")
    val generates = collectAll(p).count(_.getClass.getSimpleName == "GenerateExec")
    assert(generates == 1, s"exactly one posexplode expected, got $generates:\n$p")
    assert(countShuffles(p) <= 3,
      s"per-doc window + aggregate + sort only:\n$p")
  }

  test("epoch shuffle (q129): two-phase rank — no global-order data window") {
    val p = plan("q129_corpus_shuffle")
    assert(countBroadcasts(p) >= 1, s"bucket prefixes must broadcast:\n$p")
    // the only single-partition window runs over bucket TOTALS; the data
    // path must stay partitioned (bounded exchange count proves it)
    assert(countShuffles(p) <= 6, s"bounded exchanges expected:\n$p")
  }

  test("bloom decontamination (q131): blob broadcast, probe filters before the verify join") {
    val p = plan("q131_bloom_decontamination")
    val s = p.toString
    // the 1-row bloom blob rides a broadcast, never a cartesian
    assert(countBroadcasts(p) >= 1, s"bloom blob must broadcast:\n$p")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // the codegen'd probe must appear as a Filter BELOW the exact verify
    // join — the corpus shingle stream shrinks before anything wide
    assert(s.contains("bloom_might_contain"),
      s"bloom probe missing from the plan:\n$s")
  }

  test("incremental semdedup (q130): narrow assignment, equi-join pairs only") {
    val p = plan("q130_semdedup_incremental")
    val bnlj = collectAll(p)
      .count(_.getClass.getSimpleName == "BroadcastNestedLoopJoinExec")
    assert(bnlj >= 2, s"centroid-array folds must broadcast, got $bnlj:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"pair generation must stay a cell equi-join:\n$p")
  }

  test("url rollup (q143): two-phase aggregate — no count-distinct Expand") {
    val p = plan("q143_url_dedup_domains")
    val s = p.toString
    // distinct-URL counting must be the pre-aggregated (domain, url)
    // phase, not a COUNT DISTINCT next to COUNT (Catalyst would Expand
    // every row ahead of the shuffle)
    assert(!s.contains("Expand"), s"count-distinct Expand leaked in:\n$s")
    assert(!s.contains("Window"), s"no window in the rollup:\n$s")
    assert(countShuffles(p) <= 3, s"two agg phases + oracle sort only:\n$p")
  }

  test("gopher rules (q144): wholly narrow — only the oracle sort exchanges") {
    val p = plan("q144_gopher_rules")
    assert(countShuffles(p) <= 1, s"quality gates must not shuffle:\n$p")
    assert(!p.toString.contains("Generate"),
      s"counts must come from array kernels, not an explode:\n$p")
  }

  test("token budget (q145): cumsum windows bucket-partitioned, prefixes broadcast") {
    val p = plan("q145_token_budget")
    // the only unpartitioned window runs over bucket TOTALS (post-
    // aggregate, #buckets rows) — the corpus-sized running cost must be
    // partitioned by bucket
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, s"expected the two cumsum windows:\n$p")
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.forall(w =>
        collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
      s"unpartitioned window must sit above the bucket-totals aggregate:\n$p")
    assert(countBroadcasts(p) >= 1, s"bucket prefixes must broadcast:\n$p")
  }

  test("ccnet buckets (q146): thresholds broadcast, no per-language window") {
    val p = plan("q146_ccnet_buckets")
    val s = p.toString
    // The LM-scored (doc_id, lang, avg_score) table is localCheckpointed
    // so the corpus-sized scoring pass (token explode + model joins,
    // plan-pinned on q122) runs ONCE; the final plan consumes it as a
    // materialized RDD scan and only the tercile thresholds broadcast.
    // The corpus is never windowed by language (a dominant language
    // would funnel to one task).
    assert(s.contains("ExistingRDD"),
      s"scored table must be checkpointed (one scoring pass):\n$p")
    assert(countBroadcasts(p) >= 1, s"threshold table must broadcast:\n$p")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(!wins.exists(_.partitionSpec.toString.contains("lang")),
      s"per-language window leaked into the bucketing:\n$s")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
  }

  test("domain quota (q148): k-bounded aggregate, no window over the domain") {
    val p = plan("q148_domain_quota")
    val s = p.toString
    // the hot-domain cap must be the BoundedTopKAgg heap (collapses
    // map-side), never a row_number window that buffers a viral domain
    // in one task
    assert(!s.contains("Window"), s"window leaked into the cap:\n$s")
    assert(s.contains("ObjectHashAggregate"),
      s"expected the k-bounded heap aggregate:\n$s")
    assert(countShuffles(p) <= 2, s"agg exchange + oracle sort only:\n$p")
  }

  test("knn graph (q150): cell equi-join, k-bounded heap, no cartesian") {
    val p = plan("q150_knn_graph")
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      s"pair generation must stay a cell equi-join:\n$s")
    // the per-source top-k must be the heap aggregate, not a window
    // buffering a mega-cell's pair list
    assert(s.contains("ObjectHashAggregate"),
      s"expected the k-bounded heap aggregate:\n$s")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the only windows allowed are the k-row seed windows of the
    // k-means fixture (over <= kCells rows), never over the pair list
    assert(wins.forall(w => w.toString.contains("row_number")),
      s"unexpected window in the kNN cut:\n$s")
  }

  test("prototype pruning (q151): centroids broadcast, heap cut per cell") {
    val p = plan("q151_proto_pruning")
    val s = p.toString
    assert(countBroadcasts(p) >= 1, s"centroid table must broadcast:\n$p")
    assert(s.contains("ObjectHashAggregate"),
      s"expected the k-bounded heap aggregate:\n$s")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
  }

  test("snapshot diff (q149): fingerprints computed below the join") {
    val p = plan("q149_snapshot_diff")
    val s = p.toString
    assert(!s.contains("Window") && !s.contains("CartesianProduct"),
      s"diff must be a plain equi-join:\n$s")
    // md5 must appear in project nodes under the join (pre-join,
    // per-row) — the join itself carries only (id, digest)
    val joins = collectAll(p).filter(n =>
      n.getClass.getSimpleName.contains("SortMergeJoin") ||
        n.getClass.getSimpleName.contains("ShuffledHashJoin"))
    assert(joins.nonEmpty, s"expected the full-outer equi-join:\n$p")
    assert(joins.forall(j => j.children.forall(c =>
        collectAll(c).exists(_.toString.contains("md5")))),
      s"fingerprints must be computed below the join:\n$p")
  }

  test("doremi (q153): iteration plan reads the checkpoint, never the corpus") {
    // The corpus-scale LM scoring runs once, materialized into the
    // localCheckpoint; the unrolled 3-iteration normalization must plan
    // over the k-row checkpoint scan only — zero parquet scans.
    val p = plan("q153_doremi_weights")
    val s = collectAll(p).map(_.getClass.getSimpleName)
    assert(!s.exists(_.contains("FileSourceScan")),
      s"iteration plan must not rescan the corpus:\n$p")
    assert(!p.toString.contains("Window"), s"no window anywhere:\n$p")
  }

  test("bpe fertility (q154): narrow encode, no join, no vocab broadcast") {
    val p = plan("q154_bpe_fertility")
    val names = collectAll(p).map(_.getClass.getSimpleName)
    assert(!names.exists(_.contains("Join")),
      s"fertility must not join an encoded-vocab table back:\n$p")
    assert(countBroadcasts(p) == 0,
      s"no vocabulary broadcast (the q127 footgun):\n$p")
    // (lang, word) aggregate + lang aggregate + output sort
    assert(countShuffles(p) <= 3, s"two aggregates + sort only:\n$p")
  }

  test("mixture pack pipeline (q156): one corpus scan; weights via checkpoint") {
    // The DoReMi stage lives in its localCheckpoint; the pipeline plan
    // should scan the corpus exactly once (for token counts) and join
    // the k-row weight table by broadcast.
    val p = plan("q156_mixture_pack_pipeline")
    val scans = collectAll(p).count(_.getClass.getSimpleName.contains("FileSourceScan"))
    // 2 = packPositions' documented shape (within-bucket cumsum pass +
    // bucket-totals pass both read the replicated base). The LM-scoring
    // corpus pass is NOT here — it lives in the DoReMi checkpoint.
    assert(scans <= 2, s"expected the two packing passes only, got $scans:\n$p")
    assert(countBroadcasts(p) >= 2,
      s"weight table and bucket prefixes must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("span corruption (q157): per-doc windows only, no join") {
    val p = plan("q157_span_corruption")
    assert(!collectAll(p).map(_.getClass.getSimpleName)
        .exists(_.contains("Join")), s"no join:\n$p")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.toString.contains("doc_id")),
      s"run-id windows must partition by the document id:\n$p")
    assert(countShuffles(p) <= 4, s"explode + doc window + agg + sort:\n$p")
  }

  test("cdc neardup (q159): pairs form only in posting lists, no cartesian") {
    val p = plan("q159_cdc_neardup")
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      s"pairs must come from the chunk-hash equi-join:\n$s")
    // the only windows are cdcChunks' per-document boundary cumsums
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.forall(_.toString.contains("doc_id")),
      s"no non-document window in the pair path:\n$s")
  }

  test("datasheet (q160): no corpus-sized EXPAND for the distinct counts") {
    val p = plan("q160_corpus_datasheet")
    assert(!collectAll(p).map(_.getClass.getSimpleName).exists(_.contains("Expand")),
      s"each distinct count must run on its pre-collapsed table:\n$p")
  }

  test("line repetition (q155): combinable aggregates, no window") {
    val p = plan("q155_line_repetition")
    val s = p.toString
    assert(!s.contains("Window"),
      s"per-doc stats must be aggregates, not windows:\n$s")
    assert(!collectAll(p).map(_.getClass.getSimpleName)
        .exists(_.contains("Join")), s"no join:\n$p")
    assert(countShuffles(p) <= 3, s"two aggregates + sort only:\n$p")
  }

  test("typo pairs (q165/q166): candidates via variant equi-join, no cartesian") {
    for (q <- Seq("q165_typo_pairs", "q166_typo_pairs_tau2")) {
      val p = plan(q)
      val s = p.toString
      assert(!s.contains("CartesianProduct"), s"$q all-pairs leak:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin"), s"$q all-pairs leak:\n$s")
    }
  }

  test("label-aware embedding ops (q168/q169): cell equi-join, heap cut, no cartesian") {
    for (q <- Seq("q168_hard_negatives", "q169_label_noise")) {
      val p = plan(q)
      val s = p.toString
      // (a BroadcastNestedLoopJoin IS expected: the k-means fixture
      // folds the bounded one-row centroid table into every row — the
      // q150 pin accepts the same shape)
      assert(!s.contains("CartesianProduct"), s"$q pair-space leak:\n$s")
      // only the k-row k-means seed window is allowed — the rank cut
      // itself must be the k-bounded heap aggregate, never a window
      // buffering a cell's pair list
      assert(s.contains("ObjectHashAggregate"),
        s"$q expected the k-bounded heap aggregate:\n$s")
      val wins = collectAll(p).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.forall(w => w.toString.contains("row_number")),
        s"$q unexpected window:\n$s")
    }
  }

  test("backoff LM (q173): model tables broadcast, corpus explodes once") {
    val p = plan("q173_backoff_lm")
    // at the fixture size every model table rides a broadcast — the
    // corpus trigram stream must never shuffle for a MODEL lookup
    // (keys w1/w2/w3). The final per-doc outer join is doc-sized on
    // both sides and may legitimately sort-merge — since the r12 model
    // seams its checkpointed inputs no longer carry the tiny estimates
    // that used to make the planner broadcast it at fixture size.
    val smjKeys = collectAll(p).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        (j.leftKeys ++ j.rightKeys).map(_.toString)
    }.flatten
    assert(!smjKeys.exists(k => k.startsWith("w1#") ||
        k.startsWith("w2#") || k.startsWith("w3#")),
      s"model lookups must broadcast (or shuffle-hash over the guard):\n$p")
    assert(countBroadcasts(p) >= 5,
      s"c3/c2x2/c1x2/N must all broadcast at this size:\n$p")
  }

  test("sign projection / blocklist / signals (q174/q175/q177): wholly narrow") {
    for (q <- Seq("q174_sign_projection", "q175_blocklist_gate",
        "q177_quality_signals")) {
      val p = plan(q)
      assert(!collectAll(p).map(_.getClass.getSimpleName)
          .exists(_.contains("Join")), s"$q must not join:\n$p")
      assert(countShuffles(p) <= 1, s"$q: only the oracle sort exchanges:\n$p")
    }
  }

  test("ngram diversity (q178): two-phase distinct, no Expand, one scan") {
    val p = plan("q178_ngram_diversity")
    val s = p.toString
    assert(!s.contains("Expand"), s"count-distinct Expand leaked in:\n$s")
    // (n, gram) agg + n agg + oracle sort — and a single corpus scan
    assert(countShuffles(p) <= 3, s"two agg phases + sort only:\n$p")
    val scans = collectAll(p).count(_.getClass.getSimpleName.contains("FileSourceScan"))
    assert(scans == 1, s"per-n re-scans crept in ($scans scans):\n$p")
  }

  test("calibration (q176): narrow signals into a bounded aggregate") {
    val p = plan("q176_score_calibration")
    assert(!collectAll(p).map(_.getClass.getSimpleName)
        .exists(_.contains("Join")), s"q176 must not join:\n$p")
    assert(!p.toString.contains("Window"), s"no window:\n$p")
    assert(countShuffles(p) <= 2, s"bin aggregate + oracle sort only:\n$p")
  }

  test("projected semdedup (q179): pairs only via cell equi-join, no cartesian") {
    val p = plan("q179_semdedup_projected")
    val names = collectAll(p).map(_.getClass.getSimpleName)
    assert(!names.exists(_.contains("CartesianProduct")), s"cartesian:\n$p")
    // the centroid fold rides broadcasts; the pair join must be a hash or
    // sort-merge join keyed on the cell
    assert(names.exists(_.contains("Join")), s"expected the cell join:\n$p")
  }

  test("source datacard (q180) / calibration inputs stay un-windowed") {
    val p = plan("q180_source_datacard")
    assert(!p.toString.contains("Window"), s"no window in the rollup:\n$p")
  }

  test("ngram sketch (q181): no Expand; sketch and anchor are separate aggregates") {
    val p = plan("q181_ngram_sketch")
    assert(!p.toString.contains("Expand"),
      s"approx+exact in one Aggregate would Expand:\n$p")
  }

  test("chunk LM filter (q182): model joins broadcast at fixture size") {
    val p = plan("q182_chunk_lm_filter")
    // model lookups (keys w1/w2) must not shuffle the chunk stream; the
    // per-doc rebuild joins are doc-sized on both sides and may
    // sort-merge (see the q173 spec note on the r12 model seams)
    val smjKeys = collectAll(p).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        (j.leftKeys ++ j.rightKeys).map(_.toString)
    }.flatten
    assert(!smjKeys.exists(k => k.startsWith("w1#") || k.startsWith("w2#")),
      s"model lookups must broadcast (guard covers the large case):\n$p")
  }

  test("shard manifest (q183): two-phase rank — corpus window only by bucket") {
    val p = plan("q183_shard_manifest")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.forall(w =>
        collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
      s"unpartitioned window must sit above bucket totals only:\n$p")
  }

  test("waterfill (q184/q185): unpartitioned windows only above aggregates") {
    for (q <- Seq("q184_token_waterfill", "q185_curation_pipeline_v3")) {
      val p = plan(q)
      val wins = collectAll(p).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
      assert(unpartitioned.forall(w =>
          collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
        s"$q: quota windows must run over the bounded domain table only:\n$p")
    }
  }

  test("packing spans (q186): corpus window only by bucket; keep-best (q187) window-free") {
    val p = plan("q186_packing_spans")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.forall(w =>
        collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
      s"q186: unpartitioned window must sit above bucket totals only:\n$p")
    val kb = plan("q187_cluster_keep_best")
    // the representative cut is aggregates + join-back — a window over
    // cluster_id would buffer a mega-cluster in one task
    val kbWins = collectAll(kb).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(kbWins.isEmpty, s"q187 must not window:\n$kb")
  }

  test("isotropy (q167): projection pass is narrow — no join, no Expand") {
    // passes 1-2 are separate bounded-collect jobs; the RETURNED plan is
    // the per-row projection fold: scan → project → (oracle sort) only.
    val p = plan("q167_isotropy_proj")
    val s = p.toString
    assert(!collectAll(p).map(_.getClass.getSimpleName)
        .exists(_.contains("Join")), s"no join in the projection pass:\n$s")
    assert(!s.contains("Expand"), s"no Expand:\n$s")
    assert(countShuffles(p) <= 1, s"only the oracle sort exchanges:\n$s")
  }

  test("semantic decontamination (q188): broadcast folds + bench-broadcast compare, no window") {
    val p = plan("q188_semantic_decontamination")
    val s = p.toString
    // centroid-array assignment folds ride broadcast NLJs; the in-cell
    // compare join broadcasts the BOUNDED bench side — the corpus never
    // shuffles for either
    val bnlj = collectAll(p)
      .count(_.getClass.getSimpleName == "BroadcastNestedLoopJoinExec")
    assert(bnlj >= 1, s"centroid folds must broadcast:\n$p")
    assert(countBroadcasts(p) >= 2, s"bench side must broadcast:\n$p")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // the only window is the k-row centroid seeding (above a Limit);
    // hit counting must aggregate, never window over corpus rows
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.forall(w => collectAll(w.child).exists(c =>
        c.getClass.getSimpleName.contains("Limit") ||
          c.getClass.getSimpleName.contains("TakeOrdered"))),
      s"only the bounded seed window may appear:\n$p")
  }

  test("weighted sample (q189): k-bounded heap cut, no window, sample join-back broadcast") {
    val p = plan("q189_weighted_sample")
    val s = p.toString
    assert(s.contains("topk_agg"), s"bounded heap aggregate missing:\n$s")
    assert(!collectAll(p).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"the per-group cut must be the heap, not a window:\n$p")
    assert(countBroadcasts(p) >= 1, s"sample join-back must broadcast:\n$p")
  }

  test("whole-doc packing (q190) + borda (q191): unpartitioned windows over totals only") {
    for (q <- Seq("q190_pack_whole_docs", "q191_borda_fusion")) {
      val p = plan(q)
      val wins = collectAll(p).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, s"$q: two-phase prefix expected:\n$p")
      // any window without a partition key (q191's bucket prefix; q190's
      // is class-partitioned) must run over aggregated TOTALS only
      assert(wins.filter(_.partitionSpec.isEmpty).forall(w =>
          collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
        s"$q: unpartitioned windows must sit above bucket TOTALS only:\n$p")
      assert(countBroadcasts(p) >= 1, s"$q: prefixes must broadcast:\n$p")
    }
  }

  test("select-pack pipeline (q193): every unpartitioned window sits over totals") {
    // three chained two-phase stages (borda ranks, budget cut, packing):
    // any window without a partition key must run over aggregated bucket
    // TOTALS, never corpus rows
    val p = plan("q193_select_pack_pipeline")
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, s"two-phase prefixes expected:\n$p")
    assert(wins.filter(_.partitionSpec.isEmpty).forall(w =>
        collectAll(w.child).exists(_.toString.contains("HashAggregate"))),
      s"unpartitioned windows must sit above bucket TOTALS only:\n$p")
    assert(!p.toString.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("cross-signal report (q196): heap-cut kNN semantic side, no cartesian") {
    val p = plan("q196_cross_signal")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // the semantic candidates are the k-bounded kNN edges (topk_agg),
    // never the full in-cell pair set filtered by a threshold
    assert(s.contains("topk_agg"), s"kNN heap cut missing:\n$s")
  }

  test("cross-signal clusters (q197): sizes by aggregate, no cluster window") {
    val p = plan("q197_cross_signal_clusters")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    // cluster sizes come from aggregate + join-back; a window over
    // cluster_id would buffer a mega-cluster in one task
    val wins = collectAll(p).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(!wins.exists(_.partitionSpec.exists(
        _.toString.contains("cluster_id"))),
      s"no window over cluster_id:\n$p")
  }

  test("quantile sketch (q195) + overlap sketch (q198): sketch aggregates in-plan") {
    val p = plan("q195_quantile_sketch")
    assert(p.toString.contains("quantile_sketch"),
      s"the mergeable summary must be the estimation path:\n$p")
    val p2 = plan("q198_overlap_sketch")
    val s2 = p2.toString
    assert(s2.contains("hll_sketch_agg"), s"per-source HLL missing:\n$s2")
    assert(!s2.contains("Expand"),
      s"no COUNT-DISTINCT EXPAND — sizes come from the distinct id table:\n$s2")
  }

  test("padding report (q192): one narrow pass — no join, no window, bounded agg") {
    val p = plan("q192_padding_report")
    assert(!collectAll(p).map(_.getClass.getSimpleName)
        .exists(_.contains("Join")), s"no join:\n$p")
    assert(!collectAll(p).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"no window:\n$p")
    assert(countShuffles(p) <= 2, s"agg + oracle sort only:\n$p")
  }
}
