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
}
