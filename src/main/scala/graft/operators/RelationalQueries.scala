package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The classical relational operator surface (SURVEY.md §2.2).
  *
  * The reference (G-Research/PalletJack) delegates all of these to pyarrow
  * after metadata injection (see `/root/reference/python/test/test_palletjack.py:84-88`);
  * here they are first-class Spark DataFrame plans so Catalyst gets full
  * freedom: filters/projections push into the parquet scan, small dimension
  * tables are broadcast explicitly, and aggregations use partial (map-side)
  * combine automatically.
  *
  * Scale notes (100 TB design point):
  *  - Dimension tables (region/nation/supplier/customer at low SF) are
  *    broadcast — no shuffle of the fact table for those joins.
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  *    handles skew/coalescing at runtime.
  *  - Every aggregate is expressed on grouped columns only, so partial
  *    aggregation happens before the exchange.
  *  - Double-typed aggregates are rounded in BOTH the Spark plan and the
  *    oracle SQL, so the DuckDB hash-compare is robust to summation order
  *    (which differs across partition counts).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String): Column = to_timestamp_ntz(lit(s))

  val queries: Map[String, Q] = Map(
    // ---- Aggregation: TPC-H Q1 style pricing summary --------------------
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= ts("2000-01-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- Filter + projection (pushdown exercise) ------------------------
    "q02_filter_project" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_discount" >= 0.05 && $"l_quantity" > 45.0)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- Join + agg + top-N (TPC-H Q3 style) ----------------------------
    // Join order matters at 100 TB: the broadcast dimension filter
    // (customer/BUILDING, ~1/5 selectivity) is applied to orders BEFORE the
    // orders⋈lineitem fact-fact shuffle, so the shuffle moves ~5x less data.
    "q03_shipping_priority" -> { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, d).filter($"o_orderdate" < ts("1998-01-01"))
      val li = Tables.lineitem(s, d).filter($"l_shipdate" > ts("1998-01-01"))
      ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(li, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // ---- Semi join (EXISTS) + agg (TPC-H Q4 style) ----------------------
    "q04_order_priority" -> { (s, d) =>
      import s.implicits._
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
      val late = Tables.lineitem(s, d).filter($"l_shipdate" > ts("1999-06-01"))
      ord.join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    // ---- Multi-join star query (TPC-H Q5 style) -------------------------
    // Scale plan: region(ASIA)→nation (5 of 25 nations) restricts supplier
    // via broadcast BEFORE lineitem is touched, so the fact table is cut
    // ~5x ahead of the lineitem⋈orders shuffle instead of after it.
    "q05_local_revenue" -> { (s, d) =>
      import s.implicits._
      val asiaNation = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val asiaSup = Tables.supplier(s, d)
        .join(broadcast(asiaNation), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_nationkey", $"n_name")
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1999-01-01"))
      val li = Tables.lineitem(s, d)
      li.join(broadcast(asiaSup), $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d),
          $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- Scalar aggregate over filtered scan (TPC-H Q6 style) -----------
    "q06_forecast_revenue" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
    },

    // ---- Window: rank within partition, top-3 per group -----------------
    "q07_top_lineitems_per_supplier" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"l_suppkey", $"rk", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_suppkey", $"rk")
    },

    // ---- Window: running sum within order -------------------------------
    "q08_running_order_total" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter($"l_orderkey" < 200L)
        .withColumn("running_total", round(sum($"l_extendedprice").over(w), 2))
        .select($"l_orderkey", $"l_linenumber", $"running_total")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- Window: navigation functions (lag/lead/ntile/first_value) ------
    "q61_window_navigation" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .filter($"o_custkey" < 200L)
        .select(
          $"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          first_value($"o_orderkey").over(w).as("first_order"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // ---- RANGE-frame rolling window over event time ---------------------
    "q82_rolling_range_window" -> { (s, d) =>
      import s.implicits._
      // Time-based (not row-based) rolling frame: for every event, count +
      // value-sum of the SAME user's events in the preceding 10 minutes —
      // RANGE BETWEEN on exact integer microseconds, so frame membership
      // is engine-exact. Output aggregates per event_type (floats rounded
      // after the aggregate, q01 convention).
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-600000000L, Window.currentRow)
      Tables.events(s, d)
        .withColumn("us", expr("ts div 1000"))
        .select($"event_type",
          count(lit(1)).over(w).as("n_win"),
          sum($"value").over(w).as("v_win"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"n_win").as("window_rows_sum"),
          max($"n_win").as("max_window_rows"),
          round(sum($"v_win"), 2).as("window_value_sum"))
        .orderBy($"event_type")
    },

    // ---- Distinct + exact distinct count --------------------------------
    "q09_distinct_parts_per_flag" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"))
        .orderBy($"l_returnflag")
    },

    // ---- Top-K with deterministic tie-break -----------------------------
    "q10_topk_orders" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(25)
    },

    // ---- Set operations -------------------------------------------------
    "q11_nations_cust_minus_supp" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_acctbal" > 9000.0)
        .select($"c_nationkey".as("nationkey"))
      val su = Tables.supplier(s, d).filter($"s_acctbal" > 9000.0)
        .select($"s_nationkey".as("nationkey"))
      c.except(su).orderBy($"nationkey")
    },
    "q12_nations_cust_and_supp" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      val su = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      c.intersect(su).orderBy($"nationkey")
    },

    // ---- Anti join (NOT EXISTS) -----------------------------------------
    "q13_customers_without_orders" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .agg(count(lit(1)).as("n_customers"))
    },

    // ---- Conditional aggregation (CASE WHEN) ----------------------------
    "q14_return_share_by_status" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_linestatus")
        .agg(
          round(sum(when($"l_returnflag" === "R", $"l_extendedprice").otherwise(lit(0.0))), 2).as("returned_value"),
          round(sum($"l_extendedprice"), 2).as("total_value"),
          count(when($"l_returnflag" === "R", lit(1))).as("n_returned"))
        .orderBy($"l_linestatus")
    },

    // ---- GROUP BY ... HAVING --------------------------------------------
    "q15_big_orders_having" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(round(sum($"l_quantity"), 2).as("total_qty"))
        .filter($"total_qty" > 150.0)
        .orderBy($"l_orderkey")
    },

    // ---- ROLLUP (grouping sets) -----------------------------------------
    "q16_rollup_flag_status" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- String scalar functions ----------------------------------------
    "q17_string_funcs" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .filter($"c_custkey" <= 100L)
        .select(
          $"c_custkey",
          upper($"c_name").as("name_upper"),
          length($"c_name").as("name_len"),
          substring($"c_name", 1, 8).as("name_prefix"),
          concat($"c_mktsegment", lit("#"), $"c_nationkey".cast("string")).as("seg_key"))
        .orderBy($"c_custkey")
    },

    // ---- Date/time scalar functions -------------------------------------
    "q18_orders_by_month" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("monthly_value"))
        .orderBy($"o_year", $"o_month")
    },

    // ---- Full statistics suite ------------------------------------------
    "q19_price_stats" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(min($"l_extendedprice"), 2).as("min_price"),
          round(max($"l_extendedprice"), 2).as("max_price"),
          round(avg($"l_extendedprice"), 2).as("avg_price"),
          round(stddev_samp($"l_extendedprice"), 2).as("sd_price"))
        .orderBy($"l_returnflag")
    },

    // ---- Join cardinality / cross-dimension counts ----------------------
    "q20_customers_per_region" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(avg($"c_acctbal"), 2).as("avg_acctbal"))
        .orderBy($"r_name")
    },

    // ---- Union ----------------------------------------------------------
    "q21_union_all_keys" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      val su = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      c.union(su).groupBy($"nationkey").agg(count(lit(1)).as("n"))
        .orderBy($"nationkey")
    },

    // ---- Correlated-style aggregate subquery (avg comparison, Q17-ish) --
    "q22_below_avg_quantity" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val avgQty = li.groupBy($"l_partkey".as("ap_partkey"))
        .agg((avg($"l_quantity") * 0.5).as("half_avg"))
      li.join(avgQty, $"l_partkey" === $"ap_partkey")
        .filter($"l_quantity" < $"half_avg")
        .agg(round(sum($"l_extendedprice"), 2).as("small_lot_value"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Full outer join ------------------------------------------------
    "q26_full_outer_join" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_acctbal" > 9900.0)
        .groupBy($"c_nationkey".as("nk_c")).agg(count(lit(1)).as("rich_customers"))
      val su = Tables.supplier(s, d).filter($"s_acctbal" > 9000.0)
        .groupBy($"s_nationkey".as("nk_s")).agg(count(lit(1)).as("rich_suppliers"))
      c.join(su, $"nk_c" === $"nk_s", "full_outer")
        .select(
          coalesce($"nk_c", $"nk_s").as("nationkey"),
          $"rich_customers", $"rich_suppliers")
        .orderBy($"nationkey")
    },

    // ---- dropDuplicates / DISTINCT --------------------------------------
    "q27_drop_duplicates" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_linestatus", $"l_shipdate".isNotNull.as("has_date"))
        .dropDuplicates()
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- approx_count_distinct (HLL++) ----------------------------------
    // Output is the count of groups whose approx estimate lands within 5%
    // of the exact distinct count — integer, oracle-predictable, and a real
    // accuracy regression fails it.
    "q28_approx_distinct" -> { (s, d) =>
      import s.implicits._
      // r18 opt (guide §2.3): mixing countDistinct with approx_count_distinct
      // in ONE agg makes Spark key the partial HLL++ sketch by
      // (returnflag, partkey) — a 410-long register array PER DISTINCT PAIR
      // crossing the exchange (~3.3 KB × 200k groups at sf0.1; fatal at
      // 100 TB). Split branches: the sketch aggregates per FLAG (3 sketches
      // total), the exact distinct ships slim pairs; a broadcast join
      // reunites them. Both estimates are order-insensitive (HLL++ inserts
      // are idempotent/commutative), so results are bit-identical.
      val li = Tables.lineitem(s, d)
      val approxD = li.groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey", rsd = 0.02).as("approx_parts"))
      val exactD = li.groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("exact_parts"))
      approxD.join(broadcast(exactD), "l_returnflag")
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(abs($"approx_parts" - $"exact_parts") <=
            $"exact_parts" * 0.05, 1L).otherwise(0L)).as("groups_within_tol"))
    },

    // ---- JSON + map/array scalar functions over events ------------------
    "q29_json_props" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"),
          $"value")
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"k").as("k_sum"),
          round(avg($"value"), 3).as("avg_value"))
        .orderBy($"event_type")
    },

    // ---- CUBE grouping sets ---------------------------------------------
    "q44_cube_flag_status" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("value"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- Cross join (tiny dims only — broadcast NL, never fact×fact) ----
    "q46_cross_join" -> { (s, d) =>
      import s.implicits._
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select($"r_name".as("region_name"), $"n_name".as("nation_name"),
          ($"n_regionkey" === $"r_regionkey").as("is_home"))
        .orderBy($"region_name", $"nation_name")
    },

    // ---- Range join: equi key + date-window residual --------------------
    // Shuffles on the equi key (orderkey) only; the 30-day window is a
    // residual predicate evaluated inside the hash join — no banding or
    // explosion needed when an equi key exists.
    "q47_range_join" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      Tables.lineitem(s, d)
        .join(o, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("lines_in_window"),
          round(sum($"l_extendedprice"), 2).as("window_value"))
        .orderBy($"o_orderpriority")
    },

    // ---- Band join: interval dimension broadcast ------------------------
    // The pure-range case (no equi key): a tiny interval table joined with
    // BETWEEN. Catalyst plans broadcast-nested-loop over the broadcast
    // side — correct at any fact scale because the stream side never moves.
    "q48_band_join" -> { (s, d) =>
      import s.implicits._
      val bands = Seq(
        ("tiny", 0.0, 10.0), ("small", 10.0, 20.0), ("medium", 20.0, 30.0),
        ("large", 30.0, 40.0), ("jumbo", 40.0, 51.0))
        .toDF("band", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_lines"),
          round(avg($"l_discount"), 4).as("avg_discount"))
        .orderBy($"band")
    },

    // ---- GROUPING SETS (the general form; cube/rollup are q44/q16) ------
    "q52_grouping_sets" -> { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |       round(sum(l_quantity), 2) AS qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // ---- Pivot (explicit value list => stable output schema) ------------
    "q53_pivot" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum($"l_extendedprice"), 2))
        .withColumnRenamed("F", "val_f").withColumnRenamed("O", "val_o")
        .orderBy($"l_returnflag")
    },

    // ---- Generator / lateral view (explode) ------------------------------
    "q54_explode_tokens" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"lang", explode(split($"text", " ")).as("tok"))
        .groupBy($"lang", $"tok").agg(count(lit(1)).as("n"))
        .filter($"n" >= 100)
        .orderBy($"lang", $"n".desc, $"tok")
    },

    // ---- Approximate percentiles (tolerance-checked like q28) -----------
    // Output = how many groups have the approx median within 1% of the
    // exact one: integer, engine-agnostic, and a sketch-accuracy regression
    // flips it.
    "q51_approx_percentile" -> { (s, d) =>
      import s.implicits._
      // spreadIfNarrow on the slim projection (r19, guide §2.6): the
      // percentile buffers are object-hash partial aggregates built in the
      // SCAN stage, which runs on as many tasks as lineitem has row
      // groups (profiled: 3 tasks, 911 ms) — round-robin the two needed
      // columns over the cores first. Exact percentile is a sorted-buffer
      // merge (partition-order independent); percentile_approx's 1e-4
      // rank error is 100x inside the 1% tolerance the output asserts.
      PipelineOps.spreadIfNarrow(
        Tables.lineitem(s, d).select($"l_returnflag", $"l_extendedprice"))
        .groupBy($"l_returnflag")
        .agg(
          percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx_med"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.01, 1L)
            .otherwise(0L)).as("groups_within_tol"))
    },

    // ---- Math + array scalar functions ----------------------------------
    "q50_math_array" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(avg(sqrt($"l_extendedprice")), 3).as("avg_sqrt_price"),
          round(sum(pow($"l_discount", 2)), 3).as("sum_disc_sq"),
          round(max(log($"l_extendedprice" + 1.0)), 3).as("max_ln_price"),
          // deterministic despite collect_set's arbitrary order
          array_join(array_sort(collect_set($"l_linestatus")), ",").as("statuses"))
        .orderBy($"l_returnflag")
    },

    // ---- As-of join (point-in-time lookup) over events ------------------
    // For every click, the latest prior-or-same purchase value of the same
    // user. Single shuffle by user via the union trick (PipelineOps.asofJoin).
    "q45_asof_join" -> { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_type", $"value")
      val clicks = e.filter($"event_type" === "click").select($"user_id", $"ts_us")
      val purchases = e.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts_us").agg(max($"value").as("p_value"))
      PipelineOps.asofJoin(clicks, purchases, "user_id", "ts_us", "p_value")
        .groupBy(($"user_id" % 10).as("bucket"))
        .agg(
          count(lit(1)).as("n_clicks"),
          count($"asof_p_value").as("n_matched"),
          round(sum(coalesce($"asof_p_value", lit(0.0))), 2).as("matched_value"))
        .orderBy($"bucket")
    },

    // ---- Sessionization (30-min inactivity gap) over events -------------
    // Streaming counterpart (session_window + watermark) lives in
    // graft.streaming; this batch form is the oracle-checkable one. Gap math
    // runs on integer microseconds so any engine agrees exactly.
    "q42_sessionize" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      val sessions = Tables.events(s, d)
        .select($"user_id", expr("ts div 1000").as("ts_us")) // integer us, no double rounding
        .withColumn("prev_us", lag($"ts_us", 1).over(w))
        .withColumn("new_session",
          when($"prev_us".isNull || $"ts_us" - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      sessions
        .groupBy(($"user_id" % 10).as("user_bucket"))
        .agg(
          sum($"n_sessions").as("sessions"),
          sum($"n_events").as("events"),
          count(lit(1)).as("users"))
        .orderBy($"user_bucket")
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        | AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1999-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_local_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,
    "q07_top_lineitems_per_supplier" ->
      """SELECT l_suppkey, rk, l_orderkey, l_linenumber, l_extendedprice FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem) WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,
    "q08_running_order_total" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q61_window_navigation" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | ntile(4) OVER w AS quartile,
        | first_value(o_orderkey) OVER w AS first_order
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q82_rolling_range_window" ->
      """WITH e AS (SELECT event_type, user_id, value, epoch_us(ts) AS us FROM events),
        |win AS (
        |  SELECT event_type,
        |         count(*) OVER w AS n_win,
        |         sum(value) OVER w AS v_win
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW))
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(n_win) AS BIGINT) AS window_rows_sum,
        |       max(n_win) AS max_window_rows,
        |       round(sum(v_win), 2) AS window_value_sum
        |FROM win GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q09_distinct_parts_per_flag" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q11_nations_cust_minus_supp" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000.0
        |ORDER BY nationkey""".stripMargin,
    "q12_nations_cust_and_supp" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q13_customers_without_orders" ->
      """SELECT count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q14_return_share_by_status" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END),2) AS returned_value,
        | round(sum(l_extendedprice),2) AS total_value,
        | count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_big_orders_having" ->
      """SELECT l_orderkey, round(sum(l_quantity),2) AS total_qty
        |FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150.0
        |ORDER BY l_orderkey""".stripMargin,
    "q16_rollup_flag_status" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q17_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper, length(c_name) AS name_len,
        | substr(c_name, 1, 8) AS name_prefix,
        | c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_key
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,
    "q18_orders_by_month" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS monthly_value
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q19_price_stats" ->
      """SELECT l_returnflag,
        | round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price,
        | round(avg(l_extendedprice),2) AS avg_price,
        | round(stddev_samp(l_extendedprice),2) AS sd_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_customers_per_region" ->
      """SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal),2) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_union_all_keys" ->
      """SELECT nationkey, count(*) AS n FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_below_avg_quantity" ->
      """SELECT round(sum(l_extendedprice),2) AS small_lot_value, count(*) AS n_lines
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS ap_partkey, avg(l_quantity)*0.5 AS half_avg
        |  FROM lineitem GROUP BY 1) a ON l.l_partkey = a.ap_partkey
        |WHERE l.l_quantity < a.half_avg""".stripMargin,
    "q26_full_outer_join" ->
      """SELECT coalesce(nk_c, nk_s) AS nationkey, rich_customers, rich_suppliers
        |FROM (SELECT c_nationkey AS nk_c, count(*) AS rich_customers
        |      FROM customer WHERE c_acctbal > 9900.0 GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk_s, count(*) AS rich_suppliers
        |      FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1) s
        |ON nk_c = nk_s ORDER BY nationkey""".stripMargin,
    "q27_drop_duplicates" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate IS NOT NULL AS has_date
        |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q28_approx_distinct" ->
      """SELECT count(*) AS n_groups, CAST(count(*) AS BIGINT) AS groups_within_tol
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem)""".stripMargin,
    "q29_json_props" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        | round(avg(value), 3) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q44_cube_flag_status" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_extendedprice),2) AS value
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q45_asof_join" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |clicks AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, ts_us, max(value) AS p_value
        |              FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id % 10 AS bucket, count(*) AS n_clicks,
        |       count(p.p_value) AS n_matched,
        |       round(sum(coalesce(p.p_value, 0)), 2) AS matched_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |lagged AS (
        |  SELECT user_id, ts_us,
        |         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us
        |  FROM e),
        |flagged AS (
        |  SELECT user_id,
        |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        |per_user AS (
        |  SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |         count(*) AS n_events
        |  FROM flagged GROUP BY 1)
        |SELECT user_id % 10 AS user_bucket,
        |  CAST(sum(n_sessions) AS BIGINT) AS sessions,
        |  CAST(sum(n_events) AS BIGINT) AS events,
        |  count(*) AS users
        |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,
    "q46_cross_join" ->
      """SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |       n.n_regionkey = r.r_regionkey AS is_home
        |FROM region r CROSS JOIN nation n
        |ORDER BY region_name, nation_name""".stripMargin,
    "q47_range_join" ->
      """SELECT o.o_orderpriority, count(*) AS lines_in_window,
        |       round(sum(l.l_extendedprice), 2) AS window_value
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q51_approx_percentile" ->
      """SELECT count(*) AS n_groups, CAST(count(*) AS BIGINT) AS groups_within_tol
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem)""".stripMargin,
    "q52_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q53_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS val_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS val_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q54_explode_tokens" ->
      """SELECT lang, tok, count(*) AS n
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY 1, 2 HAVING count(*) >= 100
        |ORDER BY lang, n DESC, tok""".stripMargin,
    "q50_math_array" ->
      """SELECT l_returnflag,
        |  round(avg(sqrt(l_extendedprice)), 3) AS avg_sqrt_price,
        |  round(sum(pow(l_discount, 2)), 3) AS sum_disc_sq,
        |  round(max(ln(l_extendedprice + 1.0)), 3) AS max_ln_price,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_band_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('tiny', 0.0, 10.0), ('small', 10.0, 20.0), ('medium', 20.0, 30.0),
        |  ('large', 30.0, 40.0), ('jumbo', 40.0, 51.0))
        |SELECT band, count(*) AS n_lines,
        |       round(avg(l_discount), 4) AS avg_discount
        |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
