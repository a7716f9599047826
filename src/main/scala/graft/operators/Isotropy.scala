package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expressions.ScatterMatrixAgg
import graft.functions.VectorFunctions

/** Embedding isotropy: the "All-but-the-Top" post-processing direction
  * (Mu & Viswanath, "All-but-the-Top: Simple and Effective Postprocessing
  * for Word Representations", ICLR 2018) — the projection of every
  * embedding onto the corpus's TOP principal component, the direction
  * whose removal isotropizes the space. The projection magnitude ranks
  * documents by how much of the common (anisotropic) component they
  * carry; downstream either subtracts it or drops the tail.
  *
  * `/root/reference` has no analytics surface; part of the
  * training-data-pipeline inventory (SURVEY.md §2 Part B, embedding ops).
  *
  * Everything is FIXED-POINT long arithmetic, so the result is exact,
  * partition-order-independent, and replayable row-for-row by a
  * relational oracle:
  *   1. one corpus pass → per-dim sums (the [[graft.functions.expressions.FixedPointVectorSum]]
  *      aggregate; X_ij = round(x_ij·scale), half away from zero);
  *      fixed-point means m_j = S_j / n (truncating division — DuckDB's
  *      `//`, Scala's `/`, Spark's `div`);
  *   2. one corpus pass → mean-centered scatter matrix
  *      Q = Σ (X_i − m)(X_i − m)ᵀ (the [[ScatterMatrixAgg]] native
  *      aggregate — d(d+1)/2 longs per partition, centering bounds the
  *      entries independently of n);
  *   3. power iteration on the DRIVER over the d×d matrix (a bounded
  *      collect — one row of d(d+1)/2 longs, the k-means-centroid class
  *      of driver state): v ← Q·v, rescaled each step by the truncating
  *      divisor max(1, max|w| / vScale) so |v| stays ≤ vScale. Iteration
  *      count is fixed (no convergence test) — deterministic plans, and
  *      the oracle replays every step. Long arithmetic is checked
  *      (Math.multiplyExact/addExact): overflow fails loudly, never
  *      silently corrupts a direction;
  *   4. one narrow pass → p_i = Σ_j (X_ij − m_j)·v_j per row (an
  *      expression-only fold, no join, no shuffle).
  *
  * Scale: corpus work is two combinable aggregates + one narrow
  * projection; driver work is O(iters·d²) on d ≈ 10²-10³. The sign of v
  * (eigenvectors are sign-ambiguous) is pinned by the fixed all-ones
  * start vector and deterministic rescale, so replays agree exactly.
  */
object Isotropy {

  /** The fitted direction: fixed-point means + (unnormalized) top
    * principal direction + the row count it was fitted on. A bounded
    * driver-side value (2·d longs) — reusable across batches, epochs,
    * and streams (the fit-on-history / apply-on-arrival contract).
    */
  case class Model(means: Array[Long], v: Array[Long], n: Long, scale: Long)

  /** Fit the top-component model on `df` (two combinable corpus
    * aggregates + the driver power iteration). n == 0 yields a model
    * with empty means — [[project]] on it returns an empty frame.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      scale: Long = 1000L, iters: Int = 2, vScale: Long = 1000000L): Model = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(vScale > 0, s"vScale must be positive, got $vScale")

    // Pass 1: fixed-point per-dim sums + count (one combinable aggregate).
    val p1 = df.agg(VectorFunctions.vectorSumFixed(col(vecCol), scale).as("sn"))
      .selectExpr("sn.sums AS sums", "sn.n AS n")
      .collect()(0)
    val n = p1.getLong(1)
    if (n == 0L) return Model(Array.empty, Array.empty, 0L, scale)
    val sums = p1.getSeq[Long](0).toArray
    val d = sums.length
    val means = sums.map(_ / n) // truncating, matches DuckDB // and Spark div

    // Pass 2: mean-centered scatter (upper triangle).
    val scatterCol: Column = ColumnBridge.column(
      ScatterMatrixAgg(ColumnBridge.expression(col(vecCol)), means.toSeq, scale)
        .toAggregateExpression())
    val p2 = df.agg(scatterCol.as("qn")).selectExpr("qn.q AS q").collect()(0)
    val tri = p2.getSeq[Long](0).toArray

    // Full symmetric d×d view of the triangle.
    val mat = Array.ofDim[Long](d, d)
    var idx = 0
    var j = 0
    while (j < d) {
      var k = j
      while (k < d) { mat(j)(k) = tri(idx); mat(k)(j) = tri(idx); idx += 1; k += 1 }
      j += 1
    }

    // Power iteration, exact long arithmetic (overflow fails loudly).
    var v = Array.fill(d)(1L)
    var t = 0
    while (t < iters) {
      val w = new Array[Long](d)
      var jj = 0
      while (jj < d) {
        var acc = 0L
        var kk = 0
        while (kk < d) {
          acc = Math.addExact(acc, Math.multiplyExact(mat(jj)(kk), v(kk)))
          kk += 1
        }
        w(jj) = acc
        jj += 1
      }
      var mx = 0L
      jj = 0
      while (jj < d) { val a = math.abs(w(jj)); if (a > mx) mx = a; jj += 1 }
      val q = math.max(1L, mx / vScale) // truncating
      v = w.map(_ / q) // truncating
      t += 1
    }
    Model(means, v, n, scale)
  }

  /** The narrow projection pass: p_i = Σ_j (X_ij − m_j)·v_j under
    * `model`. A pure per-row fold (no shuffle, no state), so it applies
    * unchanged to a STREAMING frame — the fit-on-history /
    * project-on-arrival ingest twin (StreamingSpec pins batch==stream).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    if (model.n == 0L) {
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0L).as("proj")).where(lit(false))
    }
    val d = model.means.length
    val mLit = model.means.mkString("array(", "L, ", "L)")
    val vLit = model.v.mkString("array(", "L, ", "L)")
    df.select(col(idCol), col(vecCol).as("__x"))
      .withColumn("proj", expr(
        s"""aggregate(sequence(1, ${d}), 0L, (acc, i) ->
            acc + (CASE WHEN element_at(__x, i) >= 0
                   THEN CAST(floor(CAST(element_at(__x, i) AS DOUBLE) * ${model.scale} + 0.5) AS BIGINT)
                   ELSE CAST(ceil(CAST(element_at(__x, i) AS DOUBLE) * ${model.scale} - 0.5) AS BIGINT)
                   END - element_at($mLit, i)) * element_at($vLit, i))"""))
      .select(col(idCol), col("proj"))
  }

  /** Per-row fixed-point projection onto the corpus top principal
    * direction: (idCol, proj) — [[fit]] + [[project]] in one call.
    */
  def topComponentProjections(df: DataFrame, idCol: String, vecCol: String,
      scale: Long = 1000L, iters: Int = 2, vScale: Long = 1000000L): DataFrame =
    project(df, idCol, vecCol, fit(df, idCol, vecCol, scale, iters, vScale))
}
