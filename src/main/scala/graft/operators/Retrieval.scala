package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus: BM25 top-k (the
  * Okapi ranking function of Robertson & Walker, SIGIR 1994 — the
  * scoring used by every inverted-index search engine; the reference
  * kaflow has no retrieval surface, this is part of the additive
  * analytics inventory).
  *
  * Scale design — the corpus is the big side and is touched exactly
  * once, narrowly:
  *  - the query term set is tiny and BROADCAST; the corpus term stream
  *    is semi-filtered by it BEFORE any aggregation, so tf/df are
  *    computed only for terms some query mentions (a full-vocabulary
  *    tf table at 100 TB is itself corpus-sized — never built);
  *  - document length rides the explode (no second corpus scan, no
  *    corpus-sized join-back for dl);
  *  - per-(query, doc) scores aggregate with map-side combine, and the
  *    final cut is the bounded top-k aggregate ([[TopK.perGroupAgg]]) —
  *    at most k candidates per query per partition shuffle, never a
  *    per-query sort of every matching document.
  *
  * Determinism (oracle parity) — BM25 is conventionally written with a
  * log idf; any monotone transform preserves the RANKING, so this
  * implementation uses the exact rational form
  * `idf = (2N - 2df + 1) / (2df + 1)` (the classic
  * `(N - df + 0.5) / (df + 0.5)` scaled by 2/2 to make numerator and
  * denominator exact BIGINTs): one IEEE division instead of a
  * transcendental whose last ulp differs across libm implementations.
  * The saturation term is the standard
  * `tf·(k1+1) / (tf + k1·(1-b) + k1·b·dl/avgdl)` with `dl/avgdl`
  * computed as `(dl·N) / total_tokens` (integer products, one
  * division). Every per-term contribution is a fixed tree of IEEE
  * double ops both engines evaluate identically, then rounded to a
  * scaled BIGINT (`floor(c·scale + 0.5)`) BEFORE summing across a
  * query's terms — integer sums are exact and order-free, so partial
  * aggregation cannot perturb the result the way reordered double
  * sums would.
  *
  * Output: (qIdCol, rank, idCol, score_micro) with rank 1..k by
  * (score_micro DESC, doc id ASC).
  */
object Retrieval {

  /** The three derived BM25 constants (tf-numerator factor, constant
    * denominator addend, length-normalization factor). Public so the
    * oracle SQL interpolates the IDENTICAL doubles this operator uses
    * (Double.toString round-trips, so both engines parse back the same
    * bit pattern).
    */
  def bm25Constants(k1: Double = 1.2, b: Double = 0.75): (Double, Double, Double) =
    (k1 + 1, k1 * (1 - b), k1 * b)

  def bm25TopK(corpus: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               qIdCol: String, qTextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               scale: Long = 1000000L): DataFrame = {
    val (cNum, cAdd, cMul) = bm25Constants(k1, b)

    val qt = queries
      .select(col(qIdCol), explode(split(col(qTextCol), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    val qv = qt.select(col("term")).distinct()

    // One corpus pass: dl rides the explode; the broadcast semi-filter
    // shrinks the stream to query-mentioned terms before any shuffle.
    val hits = corpus
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("__dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(qv), "term")
    val tf = hits.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    // document frequency of each query term: tf is one row per
    // (doc, term), so df is a combine-safe count — and term-sized.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))

    val stats = corpus
      .select(size(split(col(textCol), " ")).cast("long").as("__dl0"))
      .agg(count(lit(1)).as("__n_docs"), sum(col("__dl0")).as("__tot"))

    // Fixed arithmetic tree — mirrored token-for-token in the oracle SQL
    // (see TextQueries q133): idf * sat, each a handful of IEEE ops over
    // exactly-represented integers and round-tripped constants.
    val idf = (lit(2L) * col("__n_docs") - lit(2L) * col("__df") + lit(1L))
      .cast("double") /
      (lit(2L) * col("__df") + lit(1L)).cast("double")
    val sat = col("__tf").cast("double") * lit(cNum) /
      (col("__tf").cast("double") + lit(cAdd) +
        lit(cMul) * ((col("__dl") * col("__n_docs")).cast("double") /
          col("__tot").cast("double")))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .select(col(qIdCol), col(idCol),
        floor(idf * sat * lit(scale.toDouble) + lit(0.5)).as("__micro"))
    val perQueryDoc = scored.groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("__micro")).as("score_micro"))
    TopK.perGroupAgg(perQueryDoc, Seq(qIdCol),
        col("score_micro"), col(idCol), k)
      .select(col(qIdCol), col("rn").cast("long").as("rank"),
        col("id").as(idCol), col("value").cast("long").as("score_micro"))
  }
}
