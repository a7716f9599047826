package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-objective (Pareto) selection — "which documents are not beaten
  * on BOTH quality and length?" — the trade-off-frontier view a curation
  * run consults before committing to one scalarized score (any weighted
  * sum picks a single point; the frontier shows every undominated
  * choice, Börzsönyi et al. 2001's skyline operator).
  */
object Skyline {

  /** Exact 2-D skyline, both objectives maximized: the distinct (x, y)
    * points for which no other point is ≥ in both coordinates and > in
    * one. Minimize an objective by negating it at the call site.
    *
    * The textbook skyline needs a dominance self-join (quadratic, or a
    * grid-pruned candidate join); in 2-D it collapses to a SUFFIX MAX —
    * a point is on the frontier iff its y is the best at its x AND
    * strictly beats the best y among all strictly-larger x:
    *   frontier(x) ⇔ ybest(x) > max{ ybest(x′) : x′ > x }.
    * Same-x domination dies in the per-x max; cross-x domination dies in
    * the suffix comparison (x′ > x gives the strict coordinate, y′ ≥ y
    * the weak one). No pairwise join at any scale.
    *
    * Scale shape: one corpus aggregate to the distinct-point table, one
    * re-aggregate to the per-x table (bounded by x's cardinality — the
    * q222 distinct-value class), then the house two-phase bucket suffix
    * max (in-bucket window partitioned by x-range bucket + one offset
    * pass over the bounded bucket table). The corpus is scanned once.
    *
    * Output: (xCol, yCol, n_points) — n_points is the multiplicity of
    * the frontier point; ties on the frontier (equal x) are impossible,
    * equal-y steps survive only at distinct x when neither dominates.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
                 bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__n"))
    val perX = pts.groupBy(col("__x"))
      .agg(max(struct(col("__y").as("y"), col("__n").as("n"))).as("__b"))
      .select(col("__x"), col("__b.y").as("__yb"), col("__b.n").as("__nb"),
        expr(s"floor(__x / ${bucketWidth}e0)").cast("long").as("__bkt"))
    // suffix max of __yb over strictly larger x: in-bucket (desc,
    // exclusive) + the bounded bucket table's exclusive suffix
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inSuf = perX.withColumn("__is", max(col("__yb")).over(wIn))
    val wOff = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perX.groupBy(col("__bkt"))
      .agg(max(col("__yb")).as("__bm"))
      .withColumn("__os", max(col("__bm")).over(wOff))
      .select(col("__bkt"), col("__os"))
    inSuf.join(offsets, "__bkt")
      .withColumn("__s", greatest(
        coalesce(col("__is"), lit(Long.MinValue)),
        coalesce(col("__os"), lit(Long.MinValue))))
      .filter(col("__yb") > col("__s"))
      .select(col("__x").as(xCol), col("__yb").as(yCol),
        col("__nb").as("n_points"))
  }
}
