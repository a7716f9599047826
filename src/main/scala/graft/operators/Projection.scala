package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Database-friendly random projection (Achlioptas 2001/2003; the sparse
  * sign-matrix instantiation of Johnson–Lindenstrauss): project each
  * embedding onto `dOut` pseudo-random ±1 directions, shrinking a wide
  * embedding table before pairwise work (dedup candidate generation,
  * drift monitoring, sketch indexes) while preserving pairwise distances
  * to within the JL distortion bound. `/root/reference` has no analytics
  * surface — this belongs to the training-data-pipeline inventory
  * layered on top (SURVEY.md §2 Part B).
  *
  * Everything is FIXED-POINT + deterministic: vectors scale to longs once
  * (`floor(x·scale + 0.5)`, the house round-half-up), and the ±1 matrix
  * is derived from a portable square-recombine congruential hash of
  * (j·dim + i + seed) — no RNG state, so the matrix is identical on
  * every executor, every re-run, and in the DuckDB oracle, which replays
  * the sign formula symbolically while the Spark side folds over the
  * matrix as a literal (the JL property over the actual data is pinned
  * empirically by ProjectionSpec's distortion test).
  *
  * Scale shape: the matrix is dOut×dim longs — a few KB — attached as a
  * plan literal; the projection itself is one NARROW per-row fold (no
  * shuffle, no join at any corpus size), exactly the int8-quantize
  * (q125) class. Each output coordinate is Σᵢ qᵢ·Sⱼᵢ in long arithmetic:
  * |out| ≤ dim · scale · max|x|, far under 2⁶³ for any sane embedding.
  */
object Projection {

  private val P = 1000000007L
  private val A = 618033988L // ~ P·(φ−1): large multiplier, wrap-heavy
  private val B = 13L

  /** The portable sign: one LCG step, a modular SQUARE (the nonlinearity
    * — a purely affine chain keeps quasi-periodic parity correlations
    * between matrix rows at stride `dim`, measured at row-correlation
    * ~1.0; squaring drops it to ~0.3 and the empirical JL ratio to
    * within-2x on >99% of pairs), then one recombining step and parity.
    * All intermediates stay under 2⁶³ (h1 < P ⇒ h1² < 10¹⁸, h2·A <
    * 6.2·10¹⁷). Replayed verbatim by the oracle SQL fragment [[signSql]].
    */
  def signOf(cell: Long): Long = {
    val h1 = (cell * A + B) % P
    val h2 = (h1 * h1) % P
    val h3 = (h2 * A + h1) % P
    if (h3 % 2 == 0) 1L else -1L
  }

  /** The ±1 matrix as rows of length `dim` — deterministic in (dOut,
    * dim, seed), built once on the driver and shipped as a literal.
    */
  def signMatrix(dOut: Int, dim: Int, seed: Long): Seq[Seq[Long]] =
    (0 until dOut).map(j => (0 until dim).map(i =>
      signOf(j.toLong * dim + i + seed)))

  /** DuckDB fragment computing [[signOf]] for an expression `cell`
    * (h1 spelled out thrice — oracle clarity over oracle speed).
    */
  def signSql(cell: String): String = {
    val h1 = s"((($cell) * $A + $B) % $P)"
    s"(CASE WHEN (((($h1 * $h1) % $P) * $A + $h1) % $P) % 2 = 0 " +
      "THEN 1 ELSE -1 END)"
  }

  /** Project `vecCol` (array<float/double>, fixed length `dim`) to
    * `dOut` coordinates: out_j = Σ_i floor(x_i·scale + 0.5) · S_ji.
    * Output: (idCol, proj array<long> of length dOut). Wholly narrow.
    * Hot path: the native codegen'd
    * [[graft.functions.expressions.SignProject]] kernel (one primitive
    * loop per row; the HOF form pays dOut·dim interpreted lambda evals
    * per row and is kept below as the spec-pinned parity reference).
    */
  def signProject(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  dOut: Int, scale: Long = 1000L, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.select(col(idCol),
      ColumnBridge.column(graft.functions.expressions.SignProject(
        ColumnBridge.expression(col(vecCol)), dOut, dim, seed, scale))
        .as("proj"))
  }

  /** HOF formulation of [[signProject]] — the interpreted parity
    * reference (ProjectionSpec pins bitwise equality with the native
    * kernel), not the hot path.
    */
  def signProjectViaHof(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        dOut: Int, scale: Long = 1000L, seed: Long = 42L): DataFrame = {
    val m = typedlit(signMatrix(dOut, dim, seed))
    val q = Clustering.scaleVector(col(vecCol), scale)
    df.select(col(idCol), q.as("__q"))
      .select(col(idCol),
        transform(m, row =>
          aggregate(zip_with(col("__q"), row, (a, s) => a * s),
            lit(0L), (acc, x) => acc + x)).as("proj"))
  }
}
