package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<float>` / `array<double>`
  * embedding columns.
  *
  * Everything is a Catalyst higher-order function (`transform` / `zip_with` /
  * `aggregate`), not a UDF: codegen-friendly, null-safe, and usable inside
  * joins and aggregations without breaking pushdown. `aggregate` folds
  * left-to-right, so the floating-point result is a deterministic function of
  * the array — the property the DuckDB-oracle parity relies on (DuckDB's
  * `list_dot_product` is the same sequential fold; verified empirically).
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (exact widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold sum of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two equal-length vectors, in double precision. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  /** Euclidean (L2) norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Fixed-point position-wise vector sum aggregate — see
    * [[graft.functions.expressions.FixedPointVectorSum]]. Returns
    * struct(sums array<long>, n long); mean(dim) = sums[dim]/scale/n.
    */
  def vectorSumFixed(v: Column, scale: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.expressions.FixedPointVectorSum(
        ColumnBridge.expression(v), scale).toAggregateExpression())
  }

  /** Cosine similarity in double precision; 0.0 for zero-norm inputs.
    * Backed by the native codegen'd [[graft.functions.expressions.CosineSimilarity]]
    * expression: one fused loop, no intermediate arrays — same sequential
    * fold (bitwise-identical results) as the HOF formulation
    * [[cosineViaHof]], several times faster in the ANN hot path.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Higher-order-function formulation of cosine (reference semantics for
    * tests; bitwise-identical to [[cosine]]).
    */
  def cosineViaHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance — the native codegen'd
    * [[graft.functions.expressions.L2DistanceSq]] kernel (one fused loop;
    * same 0.0-seeded sequential fold as the HOF formulation below, so
    * results are bitwise identical).
    */
  def l2DistanceSq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.L2DistanceSq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Higher-order-function formulation of [[l2DistanceSq]] (parity
    * reference for tests; interpreted).
    */
  def l2DistanceSqViaHof(a: Column, b: Column): Column =
    arraySum(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)))

  /** Sign-bit LSH bucket from the first `nBits` dimensions: bit j is set when
    * component j > 0 (axis-aligned random-hyperplane LSH; the synthetic
    * embeddings are centered so each bit is ~balanced). Cheap, deterministic,
    * and shuffle-friendly: bucketing is a narrow map, and the later
    * candidate join shuffles on a single int key.
    */
  def signBucket(v: Column, nBits: Int = 8): Column =
    (0 until nBits).map { j =>
      when(element_at(v, j + 1) > 0.0f, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Symmetric int8 quantization with a per-vector scale — the standard
    * 4x storage shrink for embedding corpora (at 100 TB the embedding
    * table dominates; int8 + per-row max-abs scale is the layout ANN
    * systems ingest). Returns struct(qscale, q): qscale = max|x_i| and
    * q_i = floor(x_i·127/qscale + 0.5) ∈ [-127, 127] (0 when the vector
    * is all-zero). Purely narrow per-row arithmetic; every step is an
    * exact IEEE scalar op both engines compute identically.
    */
  def int8Quantize(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.Int8Quantize(
      ColumnBridge.expression(v)))
  }

  /** The HOF reference formulation of [[int8Quantize]] — kept as the
    * spec-pinned parity twin. Quadratic per row once Catalyst collapses
    * projects (array_max inlines into the per-element lambda); never use
    * it on a hot path.
    */
  def int8QuantizeViaHof(v: Column): Column = {
    val d = toDouble(v)
    val m = array_max(transform(d, x => abs(x)))
    struct(m.as("qscale"),
      transform(d, x => when(m === 0.0, lit(0L))
        .otherwise(floor(x * 127.0 / m + 0.5).cast("long"))).as("q"))
  }
}
