package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain analytics over keyed event streams — the q104
  * transition matrix taken one step further: its STATIONARY
  * distribution (where the chain spends its time in the long run),
  * the single most-asked summary of a behavioral transition model
  * (PageRank is this operator on a link graph).
  */
object Markov {

  /** Stationary distribution of the per-key event-type chain by
    * `iters` power-iteration steps, in EXACT integer ppm both engines
    * replay term-for-term.
    *
    * Transitions: consecutive events per key in (tsCol, seqCol) order
    * (one lag window per key — the q104 machinery); the state space is
    * the union of sources and targets. Rows normalize as
    * p_ij_ppm = c_ij·1e6 div c_i; a DANGLING state (no outgoing
    * transition) self-loops with 1e6 — mass parks there rather than
    * leaking (the PageRank dangling-node convention, chosen over
    * teleport so the result stays a pure function of observed
    * transitions). pi_0 = 1e6 div K uniform; each step floors per
    * term: pi_{t+1}(j) = Σ_i (pi_t(i)·p_ij_ppm) div 1e6 — flooring
    * loses ≤ K ppm per state per step, deterministic in every engine
    * (integer sums are order-free), so the output is hash-comparable
    * while converging to the true distribution at ppm resolution.
    *
    * Scale shape: one corpus window+aggregate to the K×K count table;
    * EVERYTHING after runs on that bounded matrix, collected under a
    * loud `maxStates` guard (K states — event types, page classes —
    * is tens, not data-sized; K beyond the guard wants the q119
    * distributed PageRank instead) and iterated driver-side exactly
    * like the centroid/BPE model tables.
    *
    * Output: (state, pi_ppm) after `iters` steps.
    */
  def stationaryDistribution(df: DataFrame, keyCol: String, tsCol: String,
                             seqCol: String, stateCol: String,
                             iters: Int = 8,
                             maxStates: Int = 1000): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val counts = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol),
        lag(col(stateCol), 1).over(w).as("__from"),
        col(stateCol).as("__to"))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from"), col("__to"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxStates * maxStates + 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(counts.length <= maxStates.toLong * maxStates,
      s"transition matrix exceeds maxStates=$maxStates² cells — " +
        "use the distributed PageRank path for data-sized state spaces")
    val states = (counts.map(_._1) ++ counts.map(_._2)).distinct.sorted
    require(states.nonEmpty, "no transitions — need >= 2 events on some key")
    require(states.length <= maxStates,
      s"${states.length} states exceeds maxStates=$maxStates")
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val rowTot = new Array[Long](k)
    counts.foreach { case (f, _, c) => rowTot(idx(f)) += c }
    // p(i)(j) in ppm; dangling rows self-loop with the full 1e6
    val p = Array.fill(k, k)(0L)
    counts.foreach { case (f, t, c) =>
      p(idx(f))(idx(t)) = c * 1000000L / rowTot(idx(f))
    }
    (0 until k).foreach { i =>
      if (rowTot(i) == 0L) p(i)(i) = 1000000L
    }
    var pi = Array.fill(k)(1000000L / k)
    for (_ <- 1 to iters) {
      val next = new Array[Long](k)
      for (i <- 0 until k; j <- 0 until k)
        next(j) += pi(i) * p(i)(j) / 1000000L
      pi = next
    }
    states.zipWithIndex.map { case (s, i) => (s, pi(i)) }.toSeq
      .toDF("state", "pi_ppm")
  }

  /** Holdout accuracy of the first-order next-event predictor — the
    * EVAL companion to the transition matrix (q104) and its stationary
    * summary (q256): train "most likely next state given the current
    * one" on the deterministic 80% USER hash split (split by user, not
    * row — a user's transitions never straddle the boundary, the q279
    * leakage rule), score the holdout transitions, and report per
    * from-state the model accuracy NEXT TO the context-free baseline
    * (always predict the train-global most frequent next state). The
    * gap between the two columns is the value of sequence context —
    * the number that justifies a sequence model at all.
    *
    * Determinism: argmax ties break to the SMALLEST label (struct-min
    * of (−count, label), the house rule); a holdout from-state unseen
    * in train predicts null and scores as a miss; accuracy in exact
    * floored ppm. The user split uses the SQUARE-RECOMBINED mix
    * (the q213 lesson): the linear house hash is affine mod 1000, so a
    * small dense user-id space stripes — a 150-user corpus would land
    * entirely in train; squaring first restores spread while staying
    * engine-portable (all ops mod 1e9+7, no overflow past ~9e18).
    *
    * Scale shape: one corpus lag-window pass (user-history-bounded
    * partitions) to the transition table; the model is the K²-bounded
    * count table, broadcast to the holdout side; one aggregate per
    * from-state. No driver loop, nothing corpus².
    *
    * Output: (from_type, predicted, n, hits, acc_ppm, base_hits,
    * base_acc_ppm), one row per holdout from-state.
    */
  def nextEventAccuracy(df: DataFrame, keyCol: String, tsCol: String,
                        seqCol: String, stateCol: String,
                        trainPermille: Int = 800): DataFrame = {
    require(trainPermille > 0 && trainPermille < 1000,
      s"trainPermille must be in (0, 1000), got $trainPermille")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val trans = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol).cast("long").as("__k"),
        lag(col(stateCol), 1).over(w).as("__from"),
        col(stateCol).as("__to"))
      .filter(col("__from").isNotNull)
      .withColumn("__km", pmod(col("__k"), lit(1000000007L)))
      .withColumn("__train",
        pmod(pmod(col("__km") * col("__km"), lit(1000000007L)) * 1000003L +
          col("__km") * 12345L + 17L, lit(1000000007L)) % 1000
          < trainPermille)
    val train = trans.filter(col("__train"))
    val counts = train.groupBy(col("__from"), col("__to"))
      .agg(count(lit(1)).as("__c"))
    val pred = counts.groupBy(col("__from"))
      .agg(min(struct((-col("__c")).as("nc"), col("__to").as("t")))
        .as("__am"))
      .select(col("__from"), col("__am.t").as("__pred"))
    val global = counts.groupBy(col("__to"))
      .agg(sum(col("__c")).as("__c"))
      .agg(min(struct((-col("__c")).as("nc"), col("__to").as("t")))
        .as("__am"))
      .select(col("__am.t").as("__gpred"))
    trans.filter(!col("__train"))
      .join(broadcast(pred), Seq("__from"), "left")
      .crossJoin(broadcast(global))
      .groupBy(col("__from").as("from_type"), col("__pred").as("predicted"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pred") === col("__to"), 1L).otherwise(0L))
          .as("hits"),
        sum(when(col("__gpred") === col("__to"), 1L).otherwise(0L))
          .as("base_hits"))
      .select(col("from_type"), col("predicted"), col("n"), col("hits"),
        expr("(hits * 1000000L) div n").as("acc_ppm"),
        col("base_hits"),
        expr("(base_hits * 1000000L) div n").as("base_acc_ppm"))
  }
}
