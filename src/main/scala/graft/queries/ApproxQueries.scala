package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY.md §2 B6): HLL distinct counts and
  * approximate percentiles. Sketch values are implementation-specific, so
  * these get the driver's rows-only check (no oracle SQL) — correctness is
  * asserted in unit tests against exact counterparts with tolerance.
  */
object ApproxQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_approx_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    "q48_approx_percentile" -> { (s, d) =>
      Tables.lineitem(s, d)
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
    },

    "q68_hll_sketch" -> { (s, d) =>
      // Mergeable HLL sketches (Apache DataSketches, Spark 4 built-ins) —
      // the 100 TB distinct-count pattern: per-partition/per-day sketches
      // materialize once (here per orderstatus), global answers come from
      // merging BINARY sketch columns, never rescanning the data.
      val perStatus = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          count(lit(1)).as("n"))
      perStatus.agg(
        count(lit(1)).as("n_groups"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long").as("est_customers"),
        sum(col("n")).as("n_orders"))
    })

  val oracle: Map[String, String] = Map.empty
}
