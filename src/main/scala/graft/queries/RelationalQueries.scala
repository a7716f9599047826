package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Det._

/** Core relational inventory (SURVEY.md §2 B1-B3, B6-B7, B10-B11 subset):
  * scans, filters, joins of every type, aggregation, rollup/cube/grouping
  * sets, set ops. Every query is DuckDB-oracle-checked.
  *
  * Scale notes (local[32] is the test bed; the design target is 1000
  * executors / 100 TB):
  *  - Dimension joins (region/nation/supplier/customer) are explicit
  *    `broadcast()`: the fact side never shuffles for them.
  *  - Aggregations rely on Catalyst partial aggregation; group keys are
  *    low-cardinality so the final exchange is tiny.
  *  - Filters sit directly on scan columns → parquet predicate pushdown.
  */
object RelationalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q02_filter_pushdown" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size").between(10, 30) &&
          col("p_type").isin("SMALL", "PROMO") &&
          col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    "q03_revenue_by_nation" -> { (s, d) =>
      // TPC-H Q5 shape: fact ⋈ broadcast dims; one shuffle for the final agg.
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    "q211_salted_join" -> { (s, d) =>
      // Skew-safe salted equi-join (operators/Joins.saltedJoin): the left
      // fact scatters across 8 sub-keys, the dimension replicates 8x, and
      // the result is exactly the plain join — the oracle below IS the
      // plain join. On this data no key is hot; the query pins the
      // result-identity contract the operator's spec proves under
      // disabled-broadcast plans with a planted mega-key.
      val l = Tables.lineitem(s, d).select(
        col("l_partkey").as("p_partkey"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      graft.operators.Joins.saltedJoin(l, p, Seq("p_partkey"), salts = 8)
        .groupBy(col("p_brand"))
        .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },

    "q221_interval_lookup" -> { (s, d) =>
      // Broadcast interval-lookup join (Joins.intervalLookup — the
      // IP-geo / price-bracket enrichment shape): lineitem prices in
      // exact cents bracketed by their own PERCENTILE_DISC deciles.
      // The dimension is ten [lo, hi) intervals; the probe is an
      // O(log m) codegen'd binary search per row instead of a
      // broadcast nested-loop theta join. The oracle rebuilds the same
      // thresholds with quantile_disc and maps brackets by threshold
      // counting — the identical monotone index.
      import org.apache.spark.sql.types.DataTypes
      val cents = (c: org.apache.spark.sql.Column) =>
        (c.cast(DataTypes.createDecimalType(18, 2)) * 100).cast("long")
      val li = Tables.lineitem(s, d).select(
        cents(col("l_extendedprice")).as("pc"),
        col("l_extendedprice"), col("l_discount"))
      // Bracket id = HOW MANY of the nine (duplicate-preserving)
      // thresholds are <= pc — the oracle's CASE-sum semantics, so a
      // heavy mode that collapses two deciles SKIPS a bracket id on
      // both sides identically. Duplicated thresholds would make
      // zero-width [t, t) intervals (rejected by intervalLookup), so
      // the dim dedups the VALUES but keeps the counting ids.
      val all = graft.operators.Percentiles.percentileDisc(
          li.select(lit(0).as("g"), col("pc").as("v")), "g", "v",
          (1 to 9).map(_ / 10.0))
        .orderBy(col("p")).collect()
        .map(_.getAs[Number]("value").longValue())
      val bounds = all.distinct
      val los = (Long.MinValue + 1L) +: bounds
      val his = bounds :+ Long.MaxValue
      val ids = 0L +: bounds.map(t => all.count(_ <= t).toLong)
      import s.implicits._
      val dim = los.zip(his).zip(ids)
        .map { case ((lo, hi), i) => (lo, hi, i) }
        .toSeq.toDF("lo", "hi", "bracket")
      graft.operators.Joins.intervalLookup(li, col("pc"), dim, "lo", "hi")
        .groupBy(col("bracket"))
        .agg(count(lit(1)).as("n_items"),
          dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("bracket"))
    },

    "q04_left_join_counts" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    },

    "q05_semi_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    "q06_anti_join" -> { (s, d) =>
      val p = Tables.part(s, d)
      val l = Tables.lineitem(s, d)
      p.join(l, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    },

    "q07_full_outer_join" -> { (s, d) =>
      // Align two aggregates on a sparse key space to exercise full-outer.
      val byCust = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_open"))
      val byCust2 = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_closed"))
      byCust.withColumnRenamed("custkey", "ck_a")
        .join(byCust2.withColumnRenamed("custkey", "ck_b"),
          col("ck_a") === col("ck_b"), "full_outer")
        .select(coalesce(col("ck_a"), col("ck_b")).as("custkey"),
          coalesce(col("n_open"), lit(0L)).as("n_open"),
          coalesce(col("n_closed"), lit(0L)).as("n_closed"))
        .orderBy(col("custkey"))
    },

    "q08_agg_distinct" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },

    "q09_rollup" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    },

    "q10_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    "q11_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(cast(year(o_orderdate) AS BIGINT), -1) AS yr,
               count(1) AS n, ${/* exact-decimal sum */ ""}
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        ORDER BY status, yr""")
    },

    "q12_union_distinct" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val s1 = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      val s2 = o.filter(col("o_totalprice") > 50000).select(col("o_custkey").as("custkey"))
      s1.union(s2).distinct().orderBy(col("custkey"))
    },

    "q13_intersect_except" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      val closed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val big = o.filter(col("o_totalprice") > 90000).select(col("o_custkey").as("custkey"))
      open.intersect(closed).except(big).orderBy(col("custkey"))
    },

    "q14_theta_join" -> { (s, d) =>
      // Non-equi join: suppliers paired with richer suppliers (theta <).
      val a = Tables.supplier(s, d).select(col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
      val b = Tables.supplier(s, d).select(col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
      a.join(b, col("b1") < col("b2"))
        .select(col("k1"), col("k2"))
        .orderBy(col("k1"), col("k2"))
    })

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity")} AS sum_qty,
        ${sqlSum("l_extendedprice")} AS sum_base_price,
        ${sqlRevenue()} AS sum_disc_price,
        ${sqlAvg("l_quantity")} AS avg_qty,
        ${sqlAvg("l_extendedprice")} AS avg_price,
        ${sqlAvg("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" -> """
      SELECT p_partkey, p_name, p_brand, p_retailprice
      FROM part
      WHERE p_size BETWEEN 10 AND 30 AND p_type IN ('SMALL','PROMO')
        AND p_name LIKE '%bolt%'
      ORDER BY p_partkey""",

    "q03_revenue_by_nation" -> s"""
      SELECT n_name, ${sqlRevenue()} AS revenue, count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name""",

    "q211_salted_join" -> s"""
      SELECT p_brand, ${sqlRevenue()} AS revenue,
        ${sqlSum("l_quantity")} AS sum_qty, count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",

    "q221_interval_lookup" -> {
      val ds = (1 to 9).map(i =>
        s"CAST(quantile_disc(pc, 0.$i) AS BIGINT) AS d$i").mkString(", ")
      val cases = (1 to 9).map(i =>
        s"(CASE WHEN pc >= d$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH li AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS pc, l_extendedprice, l_discount
        FROM lineitem),
      th AS (SELECT $ds FROM li)
      SELECT CAST($cases AS BIGINT) AS bracket,
        count(*) AS n_items, ${sqlRevenue()} AS revenue
      FROM li CROSS JOIN th
      GROUP BY 1 ORDER BY 1"""
    },

    "q04_left_join_counts" -> s"""
      SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        coalesce(${sqlSum("o_totalprice")}, 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "q05_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "q06_anti_join" -> """
      SELECT p_partkey, p_name FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey""",

    "q07_full_outer_join" -> """
      WITH a AS (SELECT o_custkey AS ck_a, count(*) AS n_open FROM orders
                 WHERE o_orderstatus = 'O' GROUP BY o_custkey),
           b AS (SELECT o_custkey AS ck_b, count(*) AS n_closed FROM orders
                 WHERE o_orderstatus = 'F' GROUP BY o_custkey)
      SELECT coalesce(ck_a, ck_b) AS custkey,
             coalesce(n_open, 0) AS n_open,
             coalesce(n_closed, 0) AS n_closed
      FROM a FULL OUTER JOIN b ON ck_a = ck_b
      ORDER BY custkey""",

    "q08_agg_distinct" -> s"""
      SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        ${sqlSum("o_totalprice")} AS sum_price,
        min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
        count(*) AS n_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q09_rollup" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",

    "q10_cube" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",

    "q11_grouping_sets" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
             count(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
      ORDER BY status, yr""",

    "q12_union_distinct" -> """
      SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
      ORDER BY custkey""",

    "q13_intersect_except" -> """
      SELECT custkey FROM (
        (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 90000)
      ORDER BY custkey""",

    "q14_theta_join" -> """
      SELECT a.s_suppkey AS k1, b.s_suppkey AS k2
      FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
      ORDER BY k1, k2""")
}
