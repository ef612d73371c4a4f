package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef._
import graft.operators.{AggregateVectorized, Cond, FilterVectorized, SafeExpr}

/** Relational operator inventory: scans/filters (SURVEY.md §2.2),
  * aggregates (§2.4), sorts/limits/set-ops (§2.5), plus the join families
  * (§2.3 — absent in the reference, surfaced as above-parity capability).
  * Every query is deterministic (exact decimal sums, total ordering) so it
  * hash-matches the DuckDB oracle.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[QueryDef] = Seq(

    // ---- flagship: TPC-H Q1-style pricing summary (agg parity core) ----
    QueryDef("q01_agg_pricing_summary",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sumMoney(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            avgMoney(col("l_quantity")).as("avg_qty"),
            avgMoney(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- filter_vectorized op coverage ----------------------------------
    QueryDef("q02_filter_gt",
      (s, dir) => FilterVectorized(t(s, dir, "lineitem"),
          Seq(Cond("l_quantity", ">", 45.0)))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity > 45.0 ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q03_filter_between",
      (s, dir) => FilterVectorized(t(s, dir, "lineitem"),
          Seq(Cond("l_extendedprice", "BETWEEN", Seq(900.0, 1000.0))))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        WHERE l_extendedprice BETWEEN 900.0 AND 1000.0
        ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q04_filter_like_regex",
      (s, dir) => FilterVectorized(t(s, dir, "part"),
          Seq(Cond("p_name", "LIKE", "^(red|blue) (bolt|gear)")))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
        WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)')
        ORDER BY p_partkey""")),

    // left-fold connectors WITHOUT precedence: a OR b AND c = (a OR b) AND c
    QueryDef("q05_filter_fold_or_and",
      (s, dir) => FilterVectorized(t(s, dir, "lineitem"),
          Seq(Cond("l_quantity", ">", 48.0),
            Cond("l_discount", "<", 0.02),
            Cond("l_returnflag", "==", "R")),
          Seq("OR", "AND"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE (l_quantity > 48.0 OR l_discount < 0.02) AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q06_filter_not",
      (s, dir) => FilterVectorized(t(s, dir, "orders"),
          Seq(Cond("o_orderstatus", "==", "F", negation = true),
            Cond("o_totalprice", ">", 400000.0)),
          Seq("AND"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE NOT (o_orderstatus = 'F') AND o_totalprice > 400000.0
        ORDER BY o_orderkey""")),

    QueryDef("q07_filter_eq_ne_text",
      (s, dir) => FilterVectorized(t(s, dir, "customer"),
          Seq(Cond("c_mktsegment", "==", "BUILDING"),
            Cond("c_name", "!=", "Customer#000000004")),
          Seq("AND"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_name <> 'Customer#000000004'
        ORDER BY c_custkey""")),

    QueryDef("q08_filter_offset_limit",
      (s, dir) => FilterVectorized.paged(t(s, dir, "lineitem"),
          Seq(Cond("l_quantity", ">=", 30.0)), Nil,
          Seq("l_orderkey", "l_linenumber"), offset = 100, limit = 25)
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity >= 30.0 ORDER BY l_orderkey, l_linenumber
        LIMIT 25 OFFSET 100""")),

    QueryDef("q09_filter_ts_range",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-01-31").cast("timestamp")))
        .groupBy(to_date(col("l_shipdate")).as("ship_date"))
        .agg(count(lit(1)).as("n"), sumMoney(col("l_extendedprice")).as("revenue"))
        .orderBy("ship_date"),
      Some("""SELECT CAST(l_shipdate AS DATE) AS ship_date, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-01-31'
        GROUP BY 1 ORDER BY 1""")),

    // safe-eval string query (reference muller/core/query/safe_evaluator.py)
    QueryDef("q10_expr_string_query",
      (s, dir) => SafeExpr.filter(t(s, dir, "lineitem"),
          "l_quantity > 40 and l_discount < 0.03 or l_returnflag == 'N' and l_tax > 0.07")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_tax"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_tax
        FROM lineitem
        WHERE l_quantity > 40 AND l_discount < 0.03 OR l_returnflag = 'N' AND l_tax > 0.07
        ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q11_expr_in_list",
      (s, dir) => SafeExpr.filter(t(s, dir, "orders"),
          "o_orderpriority in ['1-URGENT', '2-HIGH'] and o_totalprice >= 450000")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice >= 450000
        ORDER BY o_orderkey""")),

    // ---- aggregate_vectorized coverage (one method per call) -----------
    QueryDef("q12_agg_count_star",
      (s, dir) => AggregateVectorized(t(s, dir, "orders"),
        groupBy = Seq("o_orderpriority"), aggregateTensors = Seq("*"),
        method = "count", orderBy = Seq("o_orderpriority")),
      Some("""SELECT o_orderpriority, COUNT(*) AS count_all FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q13_agg_min_max",
      (s, dir) => {
        val mn = AggregateVectorized(t(s, dir, "lineitem"),
          Seq("l_returnflag"), Seq("l_extendedprice", "l_quantity"), "min")
        val mx = AggregateVectorized(t(s, dir, "lineitem"),
          Seq("l_returnflag"), Seq("l_extendedprice", "l_quantity"), "max")
        mn.join(mx, "l_returnflag").orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        MIN(l_extendedprice) AS min_l_extendedprice, MIN(l_quantity) AS min_l_quantity,
        MAX(l_extendedprice) AS max_l_extendedprice, MAX(l_quantity) AS max_l_quantity
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q14_agg_sum_orderby_desc",
      (s, dir) => AggregateVectorized(
        t(s, dir, "lineitem").withColumn("l_quantity", dec2(col("l_quantity"))),
        Seq("l_suppkey"), Seq("l_quantity"), "sum",
        orderBy = Seq("sum_l_quantity", "l_suppkey"), direction = "DESC")
        .withColumn("sum_l_quantity", col("sum_l_quantity").cast("double"))
        .limit(50),
      Some("""SELECT l_suppkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_quantity
        FROM lineitem GROUP BY l_suppkey
        ORDER BY 2 DESC, l_suppkey DESC LIMIT 50""")),

    QueryDef("q15_agg_avg_multi_key",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(avgMoney(col("l_discount") * lit(100)).as("avg_discount_pct"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_discount * 100 AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_discount_pct
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q16_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY 1, 2""")),

    QueryDef("q17_histogram",
      (s, dir) => t(s, dir, "lineitem")
        .withColumn("bucket",
          floor(col("l_extendedprice") / lit(10000.0)).cast("long"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
        COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // grouping sets / rollup (absent in reference — free on Spark)
    QueryDef("q18_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // cube + grouping id (grouping-sets family; absent in reference)
    QueryDef("q19_cube_grouping",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid ASC, l_returnflag ASC NULLS FIRST,
          l_linestatus ASC NULLS FIRST""")),

    // window-formulated sessionization over the event stream table: a
    // session breaks when the per-user gap exceeds 30 minutes. The same
    // semantics as streaming.Sessionize (cross-validated in specs) but
    // expressed as lag + running-sum windows → oracle-checkable.
    QueryDef("q33_sessionize_window",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("flag",
            when(col("us") - lag("us", 1).over(w) > lit(1800000000L), 1)
              .otherwise(0))
          .withColumn("session_id", sum("flag").over(w))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            (max("us") - min("us")).as("duration_us"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        f AS (SELECT user_id, event_id, us,
          CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            > 1800000000 THEN 1 ELSE 0 END AS flag FROM e),
        g AS (SELECT user_id, us,
          CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT)
            AS session_id FROM f)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MAX(us) - MIN(us) AS duration_us
        FROM g GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ---- joins (§2.3: absent in reference; full families here) ---------
    QueryDef("q20_join_broadcast_dim",
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_type")
        .agg(count(lit(1)).as("n"), sumMoney(col("l_extendedprice")).as("revenue"))
        .orderBy("p_type"),
      Some("""SELECT p_type, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type ORDER BY p_type""")),

    QueryDef("q21_join_shuffle_fact",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q22_join_three_way",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    QueryDef("q23_join_semi",
      (s, dir) => t(s, dir, "supplier")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 49.0),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name").orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity > 49.0)
        ORDER BY s_suppkey""")),

    QueryDef("q24_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    QueryDef("q25_join_outer_nation_region",
      (s, dir) => t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"), "left")
        .join(t(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey"), "left")
        .groupBy("r_name", "n_name")
        .agg(count(col("s_suppkey")).as("suppliers"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, COUNT(s_suppkey) AS suppliers
        FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
        LEFT JOIN supplier ON s_nationkey = n_nationkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---- windows / ranking / top-k per group (§2.5) ---------------------
    QueryDef("q26_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 2)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) WHERE rk <= 2 ORDER BY o_custkey, rk""")),

    QueryDef("q27_window_running_sum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, dir, "events")
          .withColumn("running_value",
            sum(dec2(col("value"))).over(w).cast("double"))
          .filter(col("user_id") < 20)
          .select("user_id", "event_id", "running_value")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running_value
        FROM events WHERE user_id < 20 ORDER BY user_id, event_id""")),

    QueryDef("q28_window_lag_delta",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, dir, "events")
          .withColumn("delta",
            (dec2(col("value")) - lag(dec2(col("value")), 1).over(w)).cast("double"))
          .filter(col("user_id") < 20 && col("delta").isNotNull)
          .select("user_id", "event_id", "delta")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, delta FROM (
        SELECT user_id, event_id,
          CAST(CAST(value AS DECIMAL(18,2)) - LAG(CAST(value AS DECIMAL(18,2)), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS delta
        FROM events WHERE user_id < 20)
        WHERE delta IS NOT NULL ORDER BY user_id, event_id""")),

    // ---- set ops ---------------------------------------------------------
    QueryDef("q29_set_ops",
      (s, dir) => {
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
          .select("o_custkey")
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        val inter = big.intersect(urgent).withColumn("setop", lit("intersect"))
        val exc = big.except(urgent).withColumn("setop", lit("except"))
        inter.union(exc).orderBy("setop", "o_custkey")
      },
      Some("""WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0),
        urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        i AS (SELECT o_custkey, 'intersect' AS setop FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)),
        e AS (SELECT o_custkey, 'except' AS setop FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent))
        SELECT * FROM i UNION ALL SELECT * FROM e ORDER BY setop, o_custkey""")),

    QueryDef("q30_union_dedup",
      (s, dir) => {
        val a = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
          .select("c_custkey")
        val b = t(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY")
          .select("c_custkey")
        a.union(b).distinct().orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey""")),

    // ---- multi-column sort + pagination ---------------------------------
    QueryDef("q31_sort_multi_col",
      (s, dir) => t(s, dir, "part")
        .orderBy(col("p_type").asc, col("p_retailprice").desc, col("p_partkey").asc)
        .select("p_partkey", "p_type", "p_retailprice")
        .limit(100),
      Some("""SELECT p_partkey, p_type, p_retailprice FROM part
        ORDER BY p_type ASC, p_retailprice DESC, p_partkey ASC LIMIT 100""")),

    // ---- statistics / summary (§2.4 statistics.py) ----------------------
    QueryDef("q32_column_statistics",
      (s, dir) => t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("cnt"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          avgMoney(col("l_quantity")).as("mean_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          avgMoney(col("l_extendedprice")).as("mean_price"),
          countDistinct(col("l_suppkey")).as("distinct_suppliers")),
      Some("""SELECT COUNT(*) AS cnt,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_qty,
        MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_price,
        COUNT(DISTINCT l_suppkey) AS distinct_suppliers
        FROM lineitem"""))
  )
}
