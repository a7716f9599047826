package graft.queries

import graft.Tables
import graft.operators.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** Window functions, top-k, global sort/limit, and the scalar-function
  * surface (string/date/array/JSON) — SURVEY.md §2 B8, B9, B11. All
  * orderings are total (unique tiebreak) for deterministic oracle hashes.
  */
object AnalyticQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q63_window_dist" -> { (s, d) =>
      // percent_rank/cume_dist are exact rationals of integer ranks —
      // engine-deterministic doubles.
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    "q16_window_analytic" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_price"),
          last(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("latest_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "q17_window_frames" -> { (s, d) =>
      val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
      val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val moving = byKey.rowsBetween(-2, 0)
      val range = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
        .rangeBetween(-1000, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(running).cast("double").as("running_total"),
          (sum(dec(col("o_totalprice"))).over(moving).cast("double") /
            count(lit(1)).over(moving)).as("moving_avg3"),
          sum(dec(col("o_totalprice"))).over(range).cast("double").as("range_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "q18_topk_per_group" -> { (s, d) =>
      TopK.perGroup(Tables.orders(s, d), Seq("o_orderstatus"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_orderstatus"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("rn"))
    },

    "q69_topk_agg" -> { (s, d) =>
      // q18 through the bounded aggregate (no per-group sort, k-bounded
      // shuffle) — same oracle proves identical ranking incl. tiebreaks.
      TopK.perGroupAgg(Tables.orders(s, d), Seq("o_orderstatus"),
          col("o_totalprice"), col("o_orderkey"), 3)
        .select(col("o_orderstatus"), col("rn").cast("long").as("rn"),
          col("id").as("o_orderkey"), col("value").as("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("rn"))
    },

    "q19_orderby_limit" -> { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))
        .limit(20)
    },

    "q20_string_funcs" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 4).as("prefix"),
          split(col("p_name"), " ").getItem(1).as("second_word"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          lpad(col("p_brand"), 12, "#").as("padded"),
          translate(col("p_type"), "AEO", "aeo").as("translated"))
        .orderBy(col("p_partkey"))
    },

    "q21_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_2002"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey"))
    },

    "q22_array_funcs" -> { (s, d) =>
      // Tokenize once into a column; downstream expressions reuse it rather
      // than re-splitting per output column.
      val toks = col("toks")
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          array_join(slice(toks, 1, 3), "-").as("first3"),
          size(filter(toks, t => length(t) > 4)).cast("long").as("n_long_tokens"),
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_token_len"),
          array_join(slice(sort_array(array_distinct(toks)), 1, 2), ",").as("first2_sorted"))
        .orderBy(col("doc_id"))
    },

    "q23_json_funcs" -> { (s, d) =>
      // Parse the JSON once; three outputs derive from the parsed column.
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"))
        .select(col("event_id"), col("k_value"),
          (col("k_value") % 10).as("k_mod"),
          to_json(struct(col("event_type").as("t"),
            col("k_value").as("k"))).as("repacked"))
        .orderBy(col("event_id"))
    },

    "q95_decile_stats" -> { (s, d) =>
      // Global quantile binning (feature-bucketing shape): ntile(10) over
      // the whole table, then per-decile stats. A global ORDER BY window
      // centralizes the sort — kept deliberately as the BUILT-IN
      // cross-check (the q93/q50 convention); q199 computes the same
      // answer from the two-phase rank under this same oracle, and the
      // global plan audit names this query as the known exception.
      val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_totalprice"), ntile(10).over(w).cast("long").as("decile"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("decile"))
    },

    "q199_decile_stats_scaled" -> { (s, d) =>
      // q95's answer WITHOUT the global-sort window — the q111 move at
      // the ntile level: the global (price, orderkey) rank comes from
      // the two-phase bucket cumsum (price-range buckets ride a
      // partitioned window; only bucket TOTALS see a single partition),
      // and ntile's exact bucket arithmetic is applied to the rank
      // directly: with n rows, the first n mod 10 deciles take
      // floor(n/10)+1 rows. Same oracle as q95, bit for bit.
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("__b",
          floor(col("o_totalprice") / 10000.0).cast("long"))
      val inB = Window.partitionBy(col("__b"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val local = orders.withColumn("__rin",
        row_number().over(inB).cast("long"))
      val totals = orders.groupBy(col("__b")).agg(count(lit(1)).as("__bt"))
      val prefW = Window.orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefixes = totals
        .withColumn("__pre", sum(col("__bt")).over(prefW) - col("__bt"))
        .select(col("__b"), col("__pre"))
      val nTot = orders.agg(count(lit(1)).as("__n"))
      local.join(broadcast(prefixes), "__b")
        .crossJoin(broadcast(nTot))
        .withColumn("__r0", col("__pre") + col("__rin") - 1L)
        .withColumn("__q", expr("__n div 10"))
        .withColumn("__m", expr("__n % 10"))
        .withColumn("decile",
          when(col("__r0") < col("__m") * (col("__q") + 1L),
            expr("__r0 div (__q + 1)"))
            .otherwise(expr("__m + (__r0 - __m * (__q + 1)) div greatest(__q, 1)"))
            + 1L)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("decile"))
    },

    "q24_null_handling" -> { (s, d) =>
      val masked = when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
      Tables.customer(s, d)
        .select(col("c_custkey"),
          masked.as("pos_bal"),
          coalesce(masked, lit(0.0)).as("bal_or_zero"),
          masked.isNull.as("is_neg"),
          (col("c_acctbal") <=> lit(null)).as("never_true"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"))
        .orderBy(col("c_custkey"))
    })

  val oracle: Map[String, String] = Map(
    "q15_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER w AS rn, rank() OVER w AS rnk,
        dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      ORDER BY o_custkey, rn""",

    "q63_window_dist" -> """
      SELECT o_orderstatus, o_orderkey,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
        ORDER BY o_totalprice ASC, o_orderkey ASC)
      ORDER BY o_orderstatus, o_orderkey""",

    "q16_window_analytic" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        first_value(o_totalprice) OVER
          (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        last_value(o_totalprice) OVER
          (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",

    "q17_window_frames" -> """
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
          / count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (w RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",

    "q18_topk_per_group" -> """
      SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderstatus, rn""",

    "q69_topk_agg" -> """
      SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderstatus, rn""",

    "q19_orderby_limit" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 20""",

    "q20_string_funcs" -> """
      SELECT p_partkey,
        upper(p_name) AS uname,
        substring(p_name, 1, 4) AS prefix,
        string_split(p_name, ' ')[2] AS second_word,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        CAST(length(p_name) AS BIGINT) AS name_len,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        lpad(p_brand, 12, '#') AS padded,
        translate(p_type, 'AEO', 'aeo') AS translated
      FROM part ORDER BY p_partkey""",

    "q21_date_funcs" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY o_orderkey""",

    "q22_array_funcs" -> """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        array_to_string(string_split(text, ' ')[1:3], '-') AS first3,
        CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS n_long_tokens,
        CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len,
        array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:2], ',') AS first2_sorted
      FROM documents ORDER BY doc_id""",

    "q23_json_funcs" -> """
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
        CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        '{"t":"' || event_type || '","k":' || json_extract_string(props, '$.k') || '}' AS repacked
      FROM events ORDER BY event_id""",

    "q199_decile_stats_scaled" -> s"""
      WITH t AS (
        SELECT o_orderkey, o_totalprice,
          ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders)
      SELECT decile, count(*) AS n, min(o_totalprice) AS lo,
        max(o_totalprice) AS hi, ${sqlSum("o_totalprice")} AS total
      FROM t GROUP BY decile ORDER BY decile""",

    "q95_decile_stats" -> s"""
      WITH t AS (
        SELECT o_orderkey, o_totalprice,
          ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders)
      SELECT decile, count(*) AS n, min(o_totalprice) AS lo,
        max(o_totalprice) AS hi, ${sqlSum("o_totalprice")} AS total
      FROM t GROUP BY decile ORDER BY decile""",

    "q24_null_handling" -> """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
        coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero,
        (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS is_neg,
        (c_acctbal IS NOT DISTINCT FROM NULL) AS never_true,
        nullif(c_mktsegment, 'BUILDING') AS seg_nb
      FROM customer ORDER BY c_custkey""")
}
