package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structure statistics over candidate/edge tables — the
  * density complement to [[graft.operators.Dedup]]'s connected
  * components: CC says which vertices hang together, the triangle
  * census says how TIGHTLY (a dup cluster of pairwise near-copies is a
  * clique; a chain of borderline matches has no triangles — the global
  * clustering coefficient separates them at a glance).
  */
object Graphs {

  /** Exact triangle count + global clustering coefficient via
    * degree-ordered edge orientation (the MapReduce-era scalable
    * formulation, Suri & Vassilvitskii 2011): each undirected edge is
    * directed from its lower (degree, id) endpoint to the higher, every
    * wedge is then generated at its LOWEST-degree vertex — candidate
    * volume Σ outdeg², with outdeg bounded by O(√E) instead of the max
    * degree — and a triangle is a wedge whose closing edge exists (one
    * semi-join). A hub of degree d never enumerates its d² neighbor
    * pairs; the star graph produces zero candidates.
    *
    * Scale shape: edge canonicalization (distinct), one degree
    * aggregate, two vocab-sized equi-joins to attach endpoint degrees,
    * the oriented self-join (bounded by Σ outdeg²), one semi-join, and
    * bounded 1-row rollups. Exact integers; wedges/triangles in
    * DECIMAL(38,0) headroom. `canon` is consumed three times (degrees,
    * orientation, the closing semi-join) and `oriented` twice (both
    * wedge legs) — each is localCheckpoint'ed so the upstream edge
    * generation executes ONCE instead of once per consumer (the q229
    * seam pattern; 8.2 → ~3 s at sf0.1 on the q233 co-purchase graph).
    * Candidate volume is Σ outdeg² ≈ E²/V on near-uniform graphs —
    * linear in a proportional (E, V) scale-up, quadratic only if the
    * graph DENSIFIES (E grows without V); q233's 10x step measured
    * sub-linear per edge.
    *
    * Output (1 row): (n_vertices, n_edges, n_wedges, n_triangles,
    * global_cc_ppm = 3·triangles·1e6 div wedges, null when wedge-free).
    */
  def triangleStats(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).cast("long").as("__a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("__b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("__a").as("__v"))
      .unionAll(canon.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    // orient: lower (deg, id) -> higher (deg, id)
    val oriented = canon
      .join(deg.select(col("__v").as("__a"), col("__d").as("__da")), "__a")
      .join(deg.select(col("__v").as("__b"), col("__d").as("__db")), "__b")
      .select(
        when(struct(col("__da"), col("__a")) < struct(col("__db"), col("__b")),
          struct(col("__a").as("u"), col("__b").as("w")))
          .otherwise(struct(col("__b").as("u"), col("__a").as("w"))).as("__e"))
      .select(col("__e.u").as("__u"), col("__e.w").as("__w"))
      .localCheckpoint()
    // wedges at the low vertex; canonical (id-least, id-greatest) pair
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.__u") === col("e2.__u") &&
        col("e1.__w") < col("e2.__w"))
      .select(least(col("e1.__w"), col("e2.__w")).as("__a"),
        greatest(col("e1.__w"), col("e2.__w")).as("__b"))
    val triangles = wedges.join(canon, Seq("__a", "__b"), "left_semi")
      .agg(count(lit(1)).cast(dec).as("__tri"))
    val totals = canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_vertices"),
        sum(expr(s"(CAST(__d AS $dec) * (__d - 1)) div 2")).as("__wed")))
    totals.crossJoin(triangles)
      .select(col("n_vertices"), col("n_edges"),
        col("__wed").cast("long").as("n_wedges"),
        col("__tri").cast("long").as("n_triangles"),
        when(col("__wed") > 0,
          expr(s"(CAST(3 AS $dec) * __tri * 1000000) div __wed")
            .cast("long")).as("global_cc_ppm"))
  }
}
