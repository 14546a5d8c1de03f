package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.tables
import graft.functions.ParityFunctions.{duckRound, moneySum, moneyAvg, moneyDiscSum, moneySumSql, moneyAvgSql, moneyDiscSumSql}

/** Relational operator coverage (SURVEY.md §2.2): scans, projection,
  * filters, every join shape, aggregation (hash/partial), rollup/cube/
  * grouping sets, windows, sorts/limits, set ops, string/date/json
  * functions, time-window aggregation.
  *
  * The reference implements only the text pipeline subset (its stop-word
  * filter IS a broadcast anti-join, InvertedIndexer.java:124-126); the
  * rest generalizes that engine to the full testdata star schema.
  *
  * Scale notes: dimension joins (region/nation/supplier) are explicit
  * `broadcast()`; fact-fact joins (lineitem⋈orders) are left to
  * Catalyst + AQE (sort-merge with skew handling at real scale).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    tables.load(s, dir, n)

  val qs: Seq[Q] = Seq(

    // --- Aggregation: partial+final sum/avg/count (TPC-H Q1 shape) ---
    Q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(${moneySumSql("l_extendedprice")}, 2) AS sum_base_price,
        |  round(${moneyDiscSumSql("l_extendedprice", "l_discount")}, 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(${moneyAvgSql("l_extendedprice")}, 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          duckRound(sum(col("l_quantity")), 2).as("sum_qty"),
          // money aggregates sum EXACT integer cents (order-independent;
          // a double sum's partial-merge order varies run-to-run and can
          // flip the rounding boundary vs the oracle — the pl09 class)
          duckRound(moneySum(col("l_extendedprice")), 2).as("sum_base_price"),
          duckRound(moneyDiscSum(col("l_extendedprice"), col("l_discount")), 2)
            .as("sum_disc_price"),
          duckRound(avg(col("l_quantity")), 4).as("avg_qty"),
          duckRound(moneyAvg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // --- Projection + predicate pushdown into the parquet scan ---
    Q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 45
        |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate").between(
            lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --- Broadcast-hash dimension join chain ---
    Q("q03_broadcast_join",
      s"""SELECT r_name, n_name,
        |  count(*) AS n_orders,
        |  round(${moneySumSql("o_totalprice")}, 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""") { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          duckRound(moneySum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    },

    // --- Large-large (shuffle) join: lineitem ⋈ orders ---
    Q("q04_fact_join",
      s"""SELECT o_orderpriority,
        |  count(*) AS n_items,
        |  round(${moneyDiscSumSql("l_extendedprice", "l_discount")}, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          duckRound(moneyDiscSum(col("l_extendedprice"), col("l_discount")), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    },

    // --- Semi join (EXISTS) ---
    Q("q05_semi_join",
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // --- Anti join (NOT EXISTS) — the reference's stop-word shape ---
    Q("q06_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // --- Window: per-group top-k with deterministic tiebreak ---
    Q("q07_window_topk",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // --- Window: running/frame aggregates ---
    Q("q08_window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |  round(lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        duckRound(sum(col("o_totalprice"))
          .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"),
        duckRound(lag(col("o_totalprice"), 1, 0.0).over(byDate), 2).as("prev_price"),
        rank().over(byPrice).as("price_rank"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // --- Rollup ---
    Q("q09_rollup",
      s"""SELECT coalesce(r_name, '(all)') AS r_name,
        |  coalesce(n_name, '(all)') AS n_name,
        |  count(*) AS n_cust,
        |  round(${moneySumSql("c_acctbal")}, 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name, n_name""") { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        // rollup(col(...)) not rollup("name"): the string overload trips
        // Spark 4.1's DetectAmbiguousSelfJoin on join children even
        // without a self join; the Column overload resolves cleanly.
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), duckRound(moneySum(col("c_acctbal")), 2).as("total_bal"))
        .select(coalesce(col("r_name"), lit("(all)")).as("r_name"),
          coalesce(col("n_name"), lit("(all)")).as("n_name"),
          col("n_cust"), col("total_bal"))
        .orderBy("r_name", "n_name")
    },

    // --- Cube ---
    Q("q10_cube",
      s"""SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS o_orderpriority,
        |  count(*) AS n,
        |  round(${moneySumSql("o_totalprice")}, 2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), duckRound(moneySum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // --- Grouping sets (SQL entry point: spark.sql over parquet path) ---
    Q("q11_grouping_sets",
      s"""SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
        |  coalesce(l_linestatus, '(all)') AS l_linestatus,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
          |  coalesce(l_linestatus, '(all)') AS l_linestatus,
          |  count(*) AS n
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // --- Distinct ---
    Q("q12_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""") { (s, dir) =>
      t(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // --- count(DISTINCT) (exact) ---
    Q("q13_count_distinct",
      """SELECT c_nationkey,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
        |  count(*) AS n_cust
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""") { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_nationkey")
    },

    // --- Set operations: union / intersect / except ---
    Q("q14_set_ops",
      """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |     building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM rich EXCEPT SELECT * FROM building)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM rich INTERSECT SELECT * FROM building)
        |UNION ALL
        |SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM rich UNION SELECT * FROM building)
        |ORDER BY op""") { (s, dir) =>
      val c = t(s, dir, "customer")
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      def one(op: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      one("except", rich.except(building))
        .unionAll(one("intersect", rich.intersect(building)))
        .unionAll(one("union", rich.union(building).distinct()))
        .orderBy("op")
    },

    // --- Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL respect
    //     multiplicity (q14's distinct variants collapse it) ---
    Q("q32_set_ops_all",
      """WITH r AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
        |     f AS (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F')
        |SELECT 'except_all' AS op, count(*) AS n
        |FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM f)
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS n
        |FROM (SELECT * FROM r INTERSECT ALL SELECT * FROM f)
        |ORDER BY op""") { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val r = l.filter(col("l_returnflag") === "R").select("l_orderkey")
      val f = l.filter(col("l_linestatus") === "F").select("l_orderkey")
      def one(op: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      one("except_all", r.exceptAll(f))
        .unionAll(one("intersect_all", r.intersectAll(f)))
        .orderBy("op")
    },

    // --- Global sort + limit (top-N) ---
    Q("q15_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 25""") { (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    },

    // --- String functions ---
    Q("q16_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  (p_name LIKE '%o%') AS has_o
        |FROM part
        |ORDER BY p_partkey""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        col("p_name").like("%o%").as("has_o"))
        .orderBy("p_partkey")
    },

    // --- Date/time functions ---
    Q("q17_date_funcs",
      s"""SELECT date_trunc('month', o_orderdate) AS order_month,
        |  CAST(min(year(o_orderdate)) AS BIGINT) AS yr,
        |  count(*) AS n_orders,
        |  round(${moneySumSql("o_totalprice")}, 2) AS total
        |FROM orders
        |GROUP BY date_trunc('month', o_orderdate)
        |ORDER BY order_month""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
        .agg(min(year(col("o_orderdate"))).cast("long").as("yr"),
          count(lit(1)).as("n_orders"),
          duckRound(moneySum(col("o_totalprice")), 2).as("total"))
        .orderBy("order_month")
    },

    // --- CASE WHEN bucketing ---
    Q("q18_case_when",
      s"""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n,
        |  round(${moneySumSql("c_acctbal")}, 2) AS total_bal
        |FROM customer
        |GROUP BY 1
        |ORDER BY bucket""") { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"), duckRound(moneySum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy("bucket")
    },

    // --- JSON extraction ---
    Q("q19_json_extract",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    },

    // --- Correlated EXISTS subquery (SQL surface) ---
    Q("q20_exists_subquery",
      """SELECT s_suppkey, s_name
        |FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        |ORDER BY s_suppkey""") { (s, dir) =>
      t(s, dir, "supplier").createOrReplaceTempView("sq_supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("sq_lineitem")
      s.sql(
        """SELECT s_suppkey, s_name
          |FROM sq_supplier s
          |WHERE EXISTS (SELECT 1 FROM sq_lineitem l
          |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
          |ORDER BY s_suppkey""".stripMargin)
    },

    // --- HAVING ---
    Q("q21_having",
      """SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING count(*) >= 10
        |ORDER BY l_suppkey""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), duckRound(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("n_items") >= 10)
        .orderBy("l_suppkey")
    },

    // --- Tumbling event-time window (batch; streaming twin in
    //     graft.streaming.EventStreams) ---
    Q("q22_tumbling_window",
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type,
        |  count(*) AS n,
        |  round(${moneySumSql("value")}, 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""") { (s, dir) =>
      // Shared transform with the Structured Streaming twin — the same
      // aggregation runs unbounded with a watermark in EventStreams.
      graft.streaming.EventStreams.tumblingCounts(t(s, dir, "events"))
        .orderBy("window_start", "event_type")
    },

    // --- Sliding event-time window (1h window, 30min slide): each
    //     event contributes to exactly TWO windows — q22's tumbling
    //     case is the slide == width degenerate. The oracle mirrors
    //     Spark's window() by fanning each event out to its two
    //     containing window starts. ---
    Q("q33_sliding_window",
      s"""SELECT ws AS window_start, event_type, count(*) AS n,
        |  round(${moneySumSql("value")}, 2) AS total_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |           - k * INTERVAL '30 minutes' AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |GROUP BY ws, event_type
        |ORDER BY window_start, event_type""") { (s, dir) =>
      // shared transform with the Structured Streaming twin (same
      // duality as q22/tumblingCounts)
      graft.streaming.EventStreams.slidingCounts(t(s, dir, "events"))
        .orderBy("window_start", "event_type")
    },

    // --- Left outer join: customers keep a row with zero orders ---
    Q("q24_outer_join",
      s"""SELECT c_custkey, c_name,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  round(coalesce(${moneySumSql("o_totalprice")}, 0), 2) AS total_spend
        |FROM customer
        |LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          duckRound(coalesce(moneySum(col("o_totalprice")), lit(0)), 2).as("total_spend"))
        .orderBy("c_custkey")
    },

    // --- Pivot: order counts by priority per status (fixed value list
    //     so the output schema is static, as a scale plan must be) ---
    Q("q25_pivot",
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW"))
        .count()
        .toDF("o_orderstatus", "urgent", "high", "medium", "unspecified", "low")
        // absent combinations pivot to null; the FILTER oracle says 0
        .select(col("o_orderstatus") +: Seq("urgent", "high", "medium",
          "unspecified", "low").map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy("o_orderstatus")
    },

    // --- Exact interpolated percentiles (type-7 / linear, the
    //     definition Spark's percentile() and DuckDB's quantile_cont
    //     share) ---
    Q("q26_percentile",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          duckRound(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          duckRound(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // --- Sessionization: gap-based session windows per user via the
    //     session_window built-in (dynamic-gap merge inside the
    //     aggregation — one shuffle on user_id, no self-join). The
    //     oracle expresses the same semantics as a gaps-and-islands
    //     window chain: Spark merges an event into a session iff its ts
    //     is ON OR BEFORE the previous window end (= prev ts + gap) —
    //     end-INCLUSIVE, pinned by the gap-edge test in
    //     EventStreamsSpec — so only a gap STRICTLY greater than 30min
    //     starts a new session, on both sides.
    //     The stateful streaming twin (flatMapGroupsWithState) lives in
    //     graft.streaming.EventStreams. ---
    Q("q27_sessionize",
      s"""WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(${moneySumSql("value")}, 2) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          duckRound(moneySum(col("value")), 2).as("total_value"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
    },

    // --- As-of join: each event picks up the most recent order (by
    //     date) of the same customer on or before the event. Spark has
    //     no ASOF join operator; the naive compose (inequality join +
    //     per-event top-1) explodes to |event × prior orders|. This is
    //     the scale-correct formulation instead: tag + union both
    //     sides, ONE shuffle on the key, and a carry-forward
    //     last(ignoreNulls) window — cost O((events+orders) log) per
    //     key, no join blowup, skew bounded by rows-per-user. Orders
    //     are pre-collapsed to one row per (customer, date) with the
    //     max order id, making same-date ties deterministic on both
    //     sides (DuckDB's ASOF breaks ties arbitrarily otherwise). ---
    Q("q28_asof_join",
      """WITH o AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    max(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS edate
        |      FROM events)
        |SELECT e.event_id, e.user_id,
        |  o.o_orderdate AS last_order_date, o.last_orderkey
        |FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.edate >= o.o_orderdate
        |ORDER BY event_id""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").as("d"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
        .select(col("user_id"), col("d"), lit(0).as("tag"),
          lit(null).cast("long").as("event_id"), col("last_orderkey"))
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"), lit(1).as("tag"),
          col("event_id"), lit(null).cast("long").as("last_orderkey"))
      // same-date rows sort orders (tag 0) before events (tag 1), so an
      // order ON the event's date is visible to it ("on or before")
      val w = Window.partitionBy("user_id")
        .orderBy(col("d"), col("tag"), col("last_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .withColumn("lo", last(col("last_orderkey"), ignoreNulls = true).over(w))
        .withColumn("ld", last(when(col("tag") === 0, col("d")),
          ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"),
          col("ld").as("last_order_date"), col("lo").as("last_orderkey"))
        .orderBy("event_id")
    },

    // --- Time-RANGE window frame: 30-day trailing spend per customer.
    //     Distinct from q08's ROWS frame — the frame is defined by
    //     VALUE distance (dates), so sparse/bursty order histories
    //     aggregate correctly. Spark's rangeBetween needs a numeric
    //     sort key: days-since-epoch via datediff mirrors DuckDB's
    //     INTERVAL 29 DAY PRECEDING exactly (both inclusive, both
    //     include same-date peers). ---
    Q("q31_range_frame",
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW), 2)
        |    AS trailing_30d_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(datediff(col("o_orderdate"), lit("1970-01-01")))
        .rangeBetween(-29, 0)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        duckRound(sum(col("o_totalprice")).over(w), 2)
          .as("trailing_30d_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // --- Interval (range) self-join via time BINNING. Spark has no
    //     range-join optimization: the naive `b.ts BETWEEN a.ts AND
    //     a.ts + W` predicate plans a nested-loop join — O(n²) per
    //     user at scale. The composed scale path: bucket time into
    //     W-sized bins, probe side emits (bin, bin+1), equi-join on
    //     (user_id, bin), then the exact interval filter runs on the
    //     in-bin candidates only. Each qualifying pair matches exactly
    //     once (the build row has ONE bin; the probe's two keys are
    //     distinct), so no dedup shuffle. The oracle runs the naive
    //     range join — same semantics, test-SF-only plan. ---
    Q("q30_interval_join",
      """SELECT a.event_id AS a_event_id, b.event_id AS b_event_id,
        |  a.user_id,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 10 MINUTE
        | AND (b.ts > a.ts OR b.event_id > a.event_id)
        |ORDER BY a_event_id, b_event_id""") { (s, dir) =>
      val winUs = 600L * 1000000L // 10 minutes in microseconds
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("bin", expr(s"us DIV $winUs"))
      val probe = e.select(col("event_id").as("a_event_id"),
          col("user_id"), col("us").as("a_us"),
          explode(array(col("bin"), col("bin") + 1)).as("bin"))
      val build = e.select(col("event_id").as("b_event_id"),
        col("user_id"), col("us").as("b_us"), col("bin"))
      probe.join(build, Seq("user_id", "bin"))
        .filter(col("b_us") >= col("a_us") &&
          col("b_us") < col("a_us") + winUs &&
          (col("b_us") > col("a_us") ||
            col("b_event_id") > col("a_event_id")))
        .select(col("a_event_id"), col("b_event_id"), col("user_id"),
          (col("b_us") - col("a_us")).as("delta_us"))
        .orderBy("a_event_id", "b_event_id")
    },

    // --- Map functions: build a map column from aggregated entries,
    //     read it back with element_at/cardinality. Collection order
    //     doesn't matter (lookups only), so collect_list's
    //     nondeterminism is safe here. ---
    Q("q29_map_funcs",
      """WITH pc AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o_orderstatus,
        |    map_from_entries(list({'k': o_orderpriority, 'v': cnt})) AS pm
        |  FROM pc GROUP BY o_orderstatus)
        |SELECT o_orderstatus,
        |  CAST(cardinality(pm) AS INT) AS n_priorities,
        |  coalesce(pm['1-URGENT'][1], 0) AS urgent,
        |  coalesce(pm['5-LOW'][1], 0) AS low
        |FROM m ORDER BY o_orderstatus""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("o_orderstatus")
        .agg(map_from_entries(
          collect_list(struct(col("o_orderpriority"), col("cnt")))).as("pm"))
        .select(col("o_orderstatus"),
          size(col("pm")).as("n_priorities"),
          coalesce(element_at(col("pm"), "1-URGENT"), lit(0L)).as("urgent"),
          coalesce(element_at(col("pm"), "5-LOW"), lit(0L)).as("low"))
        .orderBy("o_orderstatus")
    },

    // --- Statistical aggregates: corr / covar / stddev / variance.
    //     These plan as CentralMomentAgg partials (one co-moment struct
    //     per partition, O(1) merge) — the same partial+final shape as
    //     sum/avg, so they scale identically. Partition merge order is
    //     nondeterministic, so results wobble in the last ULPs run to
    //     run; rounding granularity per column is chosen ≫ that noise
    //     (sd of ~1e4-magnitude prices keeps only 2 decimals). ---
    Q("q34_stat_aggs",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(var_pop(l_discount), 8) AS var_disc,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          duckRound(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          duckRound(covar_samp(col("l_quantity"), col("l_discount")), 6)
            .as("covar_qty_disc"),
          duckRound(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          duckRound(var_pop(col("l_discount")), 8).as("var_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // --- Higher-order array functions (transform/filter/aggregate/
    //     array_sort/slice) over the per-doc token array. Pure
    //     projection — zero shuffles before the final sort; the token
    //     array is projected ONCE (CollapseProject won't inline the
    //     non-trivial tokenize into each consumer). Empty-array edges
    //     coalesced on both sides: DuckDB's list_sum/list_max return
    //     NULL on [] where Spark's aggregate seed gives 0. ---
    Q("q35_array_hof",
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
        |  CAST(coalesce(list_max(list_transform(tk, x -> length(x))), 0) AS INT) AS max_len,
        |  CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS total_chars,
        |  array_to_string(list_sort(list_distinct(tk))[1:3], ' ') AS first3
        |FROM tk ORDER BY doc_id""") { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_distinct"),
          coalesce(array_max(transform(col("tk"), x => length(x))), lit(0))
            .as("max_len"),
          aggregate(col("tk"), lit(0L), (acc, x) => acc + length(x).cast("long"))
            .as("total_chars"),
          array_join(slice(array_sort(array_distinct(col("tk"))), 1, 3), " ")
            .as("first3"))
        .orderBy("doc_id")
    },

    // --- Distribution window functions: ntile / percent_rank /
    //     cume_dist. Partitioned by status so each group sorts
    //     independently (a global ntile would need a single range
    //     partition); ranks are exact rationals of two ints — identical
    //     IEEE doubles on both engines — rounded only for stable repr. ---
    Q("q36_window_dist",
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          duckRound(percent_rank().over(w), 6).as("pr"),
          duckRound(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderkey")
    },

    // --- Scalar subquery (SQL surface): the subquery aggregates to one
    //     row via partial+final max (its own tiny job), then the outer
    //     scan filters against the resulting literal — no join blowup.
    //     max is exact (no float accumulation), so the 0.9*max threshold
    //     is the identical IEEE double on both engines. ---
    Q("q37_scalar_subquery",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  (SELECT max(o_totalprice) FROM orders) AS corpus_max
        |FROM orders
        |WHERE o_totalprice >= 0.9 * (SELECT max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("ssq_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice,
          |  (SELECT max(o_totalprice) FROM ssq_orders) AS corpus_max
          |FROM ssq_orders
          |WHERE o_totalprice >= 0.9 * (SELECT max(o_totalprice) FROM ssq_orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // --- Generator / table-valued function: posexplode flattens the
    //     token array WITH its ordinal — the lateral-view surface. The
    //     generator runs inside the projection (one pass, no shuffle
    //     before the output sort); ordinals are emitted 1-based to
    //     match SQL ordinality convention. ---
    Q("q38_generators",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id < 10)
        |SELECT doc_id, CAST(u.pos AS INT) AS pos, u.token
        |FROM (SELECT doc_id,
        |        unnest(list_transform(tk, (x, i) -> {'pos': i, 'token': x})) AS u
        |      FROM t)
        |ORDER BY doc_id, pos""") { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      t(s, dir, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos0", "token")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("token"))
        .orderBy("doc_id", "pos")
    },

    // --- Union by NAME with missing-column fill: the schema-evolution
    //     union (two sources with reordered columns, one lacking a
    //     column entirely → NULL-filled) — `unionByName(
    //     allowMissingColumns = true)` vs DuckDB's UNION ALL BY NAME.
    //     Pure map-side concatenation: no shuffle before the sort. ---
    Q("q39_union_by_name",
      """SELECT id, amount, kind, priority FROM (
        |  SELECT o_orderkey AS id, o_totalprice AS amount, 'order' AS kind,
        |         o_orderpriority AS priority
        |  FROM orders
        |  UNION ALL BY NAME
        |  SELECT 'lineitem' AS kind, l_extendedprice AS amount, l_orderkey AS id
        |  FROM lineitem WHERE l_quantity > 49)
        |ORDER BY kind, id, amount""") { (s, dir) =>
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("amount"),
          lit("order").as("kind"), col("o_orderpriority").as("priority"))
      val b = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 49)
        .select(lit("lineitem").as("kind"), col("l_extendedprice").as("amount"),
          col("l_orderkey").as("id")) // no priority column
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("kind", "id", "amount")
    },

    // --- Navigation window functions: first_value over the RUNNING
    //     frame, last_value / nth_value over the FULL-partition frame
    //     (the default running frame makes last_value ≡ current row —
    //     the classic frame pitfall, made explicit here on both
    //     engines). Values pass through unrounded: no arithmetic, so
    //     both engines emit the identical stored doubles. ---
    Q("q40_nav_windows",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wf).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // --- LATERAL correlated derived table (SQL surface): per-customer
    //     top-2 orders via a correlated ORDER BY/LIMIT subquery.
    //     Catalyst decorrelates it into a ranked join (no per-row
    //     re-execution — the naive interpretation would re-run the
    //     subquery |customer| times); semantically the lateral twin of
    //     q07's window top-k. ---
    Q("q41_lateral_topn",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""") { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("lt_orders")
      t(s, dir, "customer").createOrReplaceTempView("lt_customer")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM lt_customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM lt_orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
    },

    // --- UNPIVOT (wide → long reshape): melt the per-row measure
    //     columns into (metric, val) pairs. Pure per-row generation in
    //     the projection — no shuffle before the output sort, row count
    //     is a fixed ×3 fan-out of the (filtered, pushed-down) scan. ---
    Q("q42_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber,
        |             l_quantity AS qty, l_discount AS disc, l_tax AS tax
        |           FROM lineitem WHERE l_orderkey < 50)
        |  ON qty, disc, tax INTO NAME metric VALUE val)
        |ORDER BY l_orderkey, l_linenumber, metric, val""") { (s, dir) =>
      // NOTE: this testdata's lineitem has duplicate (l_orderkey,
      // l_linenumber) pairs, so `val` must join the sort to make it a
      // total order (SURVEY §7 sharp-edge 5) — Spark and DuckDB
      // tie-break differently otherwise.
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"), col("l_discount").as("disc"),
          col("l_tax").as("tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("qty"), col("disc"), col("tax")),
          variableColumnName = "metric", valueColumnName = "val")
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")
    },

    // --- LISTAGG / string_agg (ordered string aggregation): DISTINCT
    //     bounds the per-group buffer by the value domain (|statuses|),
    //     NOT the group size — the listagg shape that stays O(domain)
    //     at 100 TB where an unbounded concat would OOM. WITHIN GROUP
    //     ordering makes the concatenation deterministic. ---
    Q("q43_listagg",
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("la_orders")
      s.sql(
        """SELECT o_orderpriority,
          |  listagg(DISTINCT o_orderstatus, ',')
          |    WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
          |  count(*) AS n
          |FROM la_orders
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // --- Linear-regression aggregates (regr_slope/intercept/r2/count):
    //     single-pass central-moment partials — partial+final like any
    //     sum, so one shuffle of O(groups) however large the fact side.
    //     Rounded via duckRound (SURVEY §5.4) above merge-order ULP
    //     noise. ---
    Q("q44_regression",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 8) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          duckRound(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          duckRound(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("intercept"),
          duckRound(regr_r2(col("l_extendedprice"), col("l_quantity")), 8)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")
    },

    // --- Bitwise + boolean aggregates: bit_and/or/xor over the key
    //     domain, bool_and/bool_or as grouped predicates. All are
    //     O(1)-state commutative aggregates — map-side partials, one
    //     shuffle of O(groups). ---
    Q("q45_bit_bool_aggs",
      """SELECT l_linestatus,
        |  bit_and(l_partkey) AS all_bits,
        |  bit_or(l_partkey) AS any_bits,
        |  bit_xor(l_partkey) AS parity_bits,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_discount > 0.09) AS any_deep_discount
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          bit_and(col("l_partkey")).as("all_bits"),
          bit_or(col("l_partkey")).as("any_bits"),
          bit_xor(col("l_partkey")).as("parity_bits"),
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_deep_discount"))
        .orderBy("l_linestatus")
    },

    // --- Time-series gap fill: per-user hourly activity, missing hours
    //     materialized from a sequence() spine and forward-filled with
    //     last(... ignoreNulls) over the running frame. The spine is
    //     bounded by wall-clock span (hours), not event count, so the
    //     fan-out stays fixed as the fact side grows; one shuffle for
    //     the (user, hour) agg, the fill is a window on the same user
    //     partitioning. ---
    Q("q46_gap_fill",
      s"""WITH hourly AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour,
        |         count(*) AS n, ${moneySumSql("value")} AS sum_value
        |  FROM events WHERE user_id < 8 GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
        |  FROM hourly GROUP BY user_id)
        |SELECT s.user_id, s.hour,
        |  coalesce(h.n, 0) AS n,
        |  round(last_value(h.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS carried_sum
        |FROM spine s LEFT JOIN hourly h
        |  ON s.user_id = h.user_id AND s.hour = h.hour
        |ORDER BY s.user_id, s.hour""") { (s, dir) =>
      val hourly = t(s, dir, "events")
        .filter(col("user_id") < 8)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      val spine = hourly
        .groupBy("user_id")
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
      spine.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          duckRound(last(col("sum_value"), ignoreNulls = true).over(
            Window.partitionBy(col("user_id")).orderBy(col("hour"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("carried_sum"))
        .orderBy("user_id", "hour")
    },

    // --- Equi-width histogram via width_bucket: bucket assignment is a
    //     pure projection (codegen'd arithmetic), then one O(buckets)
    //     aggregation — the profile query a curation pipeline runs
    //     before choosing filter thresholds. DuckDB lacks width_bucket,
    //     so the oracle spells out the same (x-lo)/step floor with the
    //     same under/overflow buckets 0 and n+1. ---
    Q("q47_histogram",
      """SELECT bucket, count(*) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM (SELECT CASE WHEN l_extendedprice < 0 THEN 0
        |                  WHEN l_extendedprice >= 60000 THEN 13
        |                  ELSE 1 + CAST(floor(l_extendedprice / 5000.0) AS BIGINT)
        |             END AS bucket, l_extendedprice
        |      FROM lineitem)
        |GROUP BY bucket
        |ORDER BY bucket""") { (s, dir) =>
      t(s, dir, "lineitem")
        .select(expr("width_bucket(l_extendedprice, 0, 60000, 12)").as("bucket"),
          col("l_extendedprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          duckRound(min(col("l_extendedprice")), 2).as("lo"),
          duckRound(max(col("l_extendedprice")), 2).as("hi"))
        .orderBy("bucket")
    },

    // --- Exact quartiles (percentile_cont / quantile_cont): ordered-set
    //     aggregate over exact integer cents. Percentage points are
    //     restricted to {.25, .5, .75} ON PURPOSE: p·(n−1) and the
    //     interpolation products f·(b−a) are then EXACT doubles (2^-2
    //     fractions × integer cents), so the two engines' interpolation
    //     formulas — whatever their algebraic shape — produce the same
    //     bits. Arbitrary p (e.g. 0.9) makes f inexact and exposes
    //     lower+(hi−lo)·f vs (1−f)·lo+f·hi ULP divergence. ---
    Q("q48_quartiles",
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  round(CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS DOUBLE) / 100.0, 4) AS p25_price,
        |  round(CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.50) AS DOUBLE) / 100.0, 4) AS p50_price,
        |  round(CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS DOUBLE) / 100.0, 4) AS p75_price,
        |  round(CAST(quantile_cont(CAST(round(l_quantity) AS BIGINT), 0.50) AS DOUBLE), 4) AS p50_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val qty = round(col("l_quantity")).cast("long")
      // ONE percentile aggregate for all three price points: the exact
      // percentile buffers a value→count map per group, so three
      // separate aggs tripled the buffer work (4.6s → ~2s at sf0.1)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          percentile(cents, array(lit(0.25), lit(0.50), lit(0.75))).as("ps"),
          duckRound(percentile(qty, lit(0.50)), 4).as("p50_qty"))
        .select(col("l_returnflag"), col("n"),
          duckRound(element_at(col("ps"), 1) / 100.0, 4).as("p25_price"),
          duckRound(element_at(col("ps"), 2) / 100.0, 4).as("p50_price"),
          duckRound(element_at(col("ps"), 3) / 100.0, 4).as("p75_price"),
          col("p50_qty"))
        .orderBy("l_returnflag")
    },

    // --- Null-safe equality join (<=> / IS NOT DISTINCT FROM): the
    //     join treats NULL as a real key value — NULL matches NULL,
    //     which a plain equi-join silently drops. Still a hash-joinable
    //     equi-predicate (EqualNullSafe), so the plan is the same
    //     broadcast/SMJ as q03/q04, not a BNLJ. The key is the NATURAL
    //     custkey with every 500th key nulled out (the dirty-FK shape:
    //     "unknown customer" rows), so the non-null side scales like
    //     the real FK join — key cardinality grows WITH the data,
    //     per-key fan-out stays ~constant — while the NULL residue
    //     class concentrates 1/500 of BOTH sides into ONE hash bucket:
    //     the documented AQE skew-join case, quadratic only within
    //     that sliver (9000 pairs at sf0.1, 90M at 100× — the skewed
    //     bucket AQE splits, not a plan problem). Rounds ≤12 used
    //     `custkey % 500` itself as the key: a FIXED 500-key space
    //     makes TOTAL pair volume quadratic in SF (×9.6 at 10×, ~45B
    //     pairs at 100×) — an artifact of the synthetic modulus, not
    //     of nullsafe joins — so the 100×-posture sweep replaced it
    //     with this natural-key shape. ---
    Q("q49_nullsafe_join",
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_custkey % 500 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM orders),
        |c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 500 = 0 THEN NULL ELSE c_custkey END AS k
        |  FROM customer)
        |SELECT o.k AS k, count(*) AS n_pairs,
        |  count(DISTINCT o.o_orderkey) AS n_orders,
        |  count(DISTINCT c.c_custkey) AS n_customers
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
        |GROUP BY o.k
        |ORDER BY k NULLS FIRST""") { (s, dir) =>
      def keyed(c: org.apache.spark.sql.Column) =
        when(c % 500 === 0, lit(null)).otherwise(c)
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), keyed(col("o_custkey")).as("k"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), keyed(col("c_custkey")).as("ck"))
      o.join(c, col("k") <=> col("ck"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("k").asc_nulls_first)
    },

    // --- Z-order (Morton) clustering key: interleave the bits of two
    //     columns into one BIGINT sort key (graft.operators.ZOrder —
    //     a pure codegen'd shift/mask expression, no UDF). Writing the
    //     table sorted by this key makes BOTH columns' per-file min-max
    //     stats tight simultaneously, so a 2-d box predicate prunes
    //     files on either column — the layout move behind Delta's
    //     OPTIMIZE ZORDER BY, at 100 TB the difference between reading
    //     a hyper-rectangle and reading everything (file-skipping
    //     effect itself is pinned in ZOrderSpec; this query pins the
    //     key's bit layout against an independent SQL formulation). ---
    Q("q50_zorder_key", {
      // col 0 bit j → output bit 2j, col 1 bit j → 2j+1 (round-robin
      // interleave) — the same layout ZOrder.zValue documents
      val zTerms = (0 until 8).flatMap(j => Seq(
        s"(((x >> $j) & 1) << ${2 * j})",
        s"(((y >> $j) & 1) << ${2 * j + 1})")).mkString(" + ")
      s"""WITH pts AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_partkey % 256 AS x, l_suppkey % 256 AS y
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, x, y,
         |  CAST($zTerms AS BIGINT) AS zval
         |FROM pts
         |ORDER BY zval, l_orderkey, l_linenumber"""
    }) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
        .withColumn("zval",
          graft.operators.ZOrder.zValue(Seq(col("x"), col("y")), bits = 8))
        .orderBy("zval", "l_orderkey", "l_linenumber")
    },

    // --- Recursive CTE (WITH RECURSIVE, ANSI SQL:1999 — new in Spark
    //     4.0): walk a parent hierarchy (parent(k) = ⌊k/2⌋, the
    //     implicit binary tree over custkeys — key 0 is the root; the
    //     cur >= 1 guard stops the walk there since ⌊0/2⌋ = 0 would
    //     self-loop forever). Each recursion level plans one equi-join
    //     against the dimension — depth ⌈log₂ max_key⌉ levels total, so
    //     the iteration count grows with key WIDTH, not row count. For
    //     graph closure over data-sized components, pointer-jumping /
    //     star-contraction CC (dd06, `operators/ConnectedComponents`)
    //     is the O(log n)-rounds scale path; this is the SQL surface. ---
    Q("q51_recursive_cte",
      """WITH RECURSIVE walk(k, cur, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT w.k, c.c_custkey, w.depth + 1
        |  FROM walk w JOIN customer c
        |    ON w.cur >= 1 AND c.c_custkey = CAST(floor(w.cur / 2.0) AS BIGINT))
        |SELECT depth, count(*) AS n, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT k, max(depth) AS depth FROM walk GROUP BY k)
        |GROUP BY depth ORDER BY depth""") { (s, dir) =>
      // the recursion joins this dimension once PER LEVEL (~log2 of
      // the max key, 15 levels at sf0.1) and Spark's recursive-CTE
      // execution re-plans the view each iteration — persist it so
      // levels 2..d read the in-memory relation instead of re-scanning
      // parquet. Bounded: it is the dimension table, not the walk.
      //
      // cteRecursionRowLimit: Spark's runaway-recursion guard counts
      // TOTAL rows across levels (default 10⁶) — a correctness-
      // irrelevant safety knob that a 1.5M-customer corpus trips even
      // though depth stays key-width-bounded (the varied 100x probe
      // hit it). Scale with the anchor cardinality, and RESTORE it
      // (round-16 verdict wrong #3: leaving it at ~70× the corpus
      // weakens the runaway guard for every later query in the
      // session — the SketchStore partitionOverwriteMode set/restore
      // pattern applies). The guard is consulted at EXECUTION time,
      // so the walk must run while the raised limit is in scope:
      // materialize eagerly via localCheckpoint — the checkpointed
      // frame is the post-aggregation result, ≤ 64 rows by the
      // key-width depth bound, never the walk itself — then hand the
      // caller a plan that no longer needs the conf.
      val dim = t(s, dir, "customer")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dim.createOrReplaceTempView("q51_customer")
      val limitKey = "spark.sql.cteRecursionRowLimit"
      val prior = s.conf.getOption(limitKey)
      s.conf.set(limitKey,
        math.max(1000000L, dim.count() * 70L).toString)
      try {
        s.sql("""
          WITH RECURSIVE walk(k, cur, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM q51_customer
            UNION ALL
            SELECT w.k, c.c_custkey, w.depth + 1
            FROM walk w JOIN q51_customer c
              ON w.cur >= 1 AND c.c_custkey = CAST(floor(w.cur / 2.0) AS BIGINT))
          SELECT depth, count(*) AS n, min(k) AS min_k, max(k) AS max_k
          FROM (SELECT k, max(depth) AS depth FROM walk GROUP BY k)
          GROUP BY depth ORDER BY depth""").localCheckpoint()
      } finally {
        prior match {
          case Some(x) => s.conf.set(limitKey, x)
          case None    => s.conf.unset(limitKey)
        }
        dim.unpersist()
      }
    },

    // --- Ordered-event funnel (view → click → purchase): per user, the
    //     earliest view, the earliest click AFTER it, the earliest
    //     purchase after THAT — sequence matching by staged conditional
    //     min-aggregation, the set-based formulation of
    //     MATCH_RECOGNIZE's simplest pattern. All three stages group
    //     and join on user_id (one co-partitioned key end to end), and
    //     each stage's frame shrinks monotonically — at 100 TB the
    //     funnel is three user-keyed aggregations over an
    //     ever-narrowing survivor set, never a per-user sort. Output
    //     counts only: timestamps stay internal (ns vs µs parquet
    //     types would fuzz a timestamp compare, not the semantics). ---
    Q("q52_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""") { (s, dir) =>
      val ev = t(s, dir, "events")
      // v and c are each consumed twice (the next funnel stage AND
      // their own count row); unpersisted, the count rows replan the
      // prior stages — the baseline plan scanned events 6 times
      // (1 + 2 + 3, one per nesting level) for a three-stage funnel
      import org.apache.spark.storage.StorageLevel
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // --- FULL OUTER join: the reconciliation shape (two period
    //     snapshots of the same key space, rows surviving from either
    //     side with NULL fill) — the one join type the surface lacked
    //     as a standalone operator (sm13's RRF uses it internally).
    //     Both sides pre-aggregate to |customers-with-orders| rows
    //     BEFORE the join, so the full-outer SMJ joins two
    //     already-collapsed frames on their natural key — never the
    //     raw fact table against itself. CASE over side-nullness
    //     classifies churn (both / first-period-only / second-only):
    //     the warehouse year-over-year report. ---
    Q("q53_full_outer",
      s"""WITH y95 AS (
        |  SELECT o_custkey AS ck, count(*) AS n95,
        |    ${moneySumSql("o_totalprice")} AS rev95
        |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
        |y96 AS (
        |  SELECT o_custkey AS ck, count(*) AS n96,
        |    ${moneySumSql("o_totalprice")} AS rev96
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
        |SELECT coalesce(y95.ck, y96.ck) AS custkey,
        |  CAST(coalesce(n95, 0) AS BIGINT) AS n95,
        |  coalesce(rev95, 0.0) AS rev95,
        |  CAST(coalesce(n96, 0) AS BIGINT) AS n96,
        |  coalesce(rev96, 0.0) AS rev96,
        |  CASE WHEN y95.ck IS NULL THEN 'new'
        |       WHEN y96.ck IS NULL THEN 'churned'
        |       ELSE 'retained' END AS status
        |FROM y95 FULL OUTER JOIN y96 ON y95.ck = y96.ck
        |ORDER BY custkey""") { (s, dir) =>
      val o = t(s, dir, "orders")
      def yr(y: Int, n: String, rev: String) =
        o.filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as(n),
            moneySum(col("o_totalprice")).as(rev))
      val y95 = yr(1995, "n95", "rev95")
      val y96 = yr(1996, "n96", "rev96")
      y95.join(y96.withColumnRenamed("ck", "ck2"),
          col("ck") === col("ck2"), "full_outer")
        .select(coalesce(col("ck"), col("ck2")).as("custkey"),
          coalesce(col("n95"), lit(0L)).as("n95"),
          coalesce(col("rev95"), lit(0.0)).as("rev95"),
          coalesce(col("n96"), lit(0L)).as("n96"),
          coalesce(col("rev96"), lit(0.0)).as("rev96"),
          when(col("ck").isNull, "new")
            .when(col("ck2").isNull, "churned")
            .otherwise("retained").as("status"))
        .orderBy("custkey")
    },

    // --- approx_count_distinct with its ERROR BOUND verified in-band:
    //     the raw HLL++ estimate has no cross-engine value oracle
    //     (Spark's and DuckDB's sketches disagree by design), but the
    //     operator's CONTRACT is checkable — the estimate must land
    //     within a small relative error of the exact distinct count
    //     (3× the default 5% rsd here, generous headroom over the
    //     probabilistic bound on fixed test data). The query emits the
    //     exact count (oracle-able) plus the attestation boolean, so
    //     the hash check fails exactly when the sketch breaks its
    //     bound. Raw estimates stay pinned by ApproxCountDistinctSpec;
    //     the exact variant is q13 ---
    Q("q23_approx_count_distinct",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          count_distinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .select(col("l_returnflag"), col("n"), col("n_exact"),
          (abs(col("approx") - col("n_exact")).cast("double") <=
            col("n_exact") * lit(0.15)).as("approx_ok"))
        .orderBy("l_returnflag")
    },

    // --- VARIANT semi-structured access (new in Spark 4): the payload
    //     is parsed ONCE into the binary variant encoding, then every
    //     field access is a typed O(fields) probe — where q19's
    //     get_json_object re-parses the JSON STRING per extraction
    //     (k extractions = k parses at 100 TB). Nested JSON is
    //     synthesized deterministically around the corpus `props`
    //     column so the nested path and the absent-path NULL semantics
    //     (try_variant_get) are both observable; DuckDB's oracle reads
    //     the same synthesized strings with its native JSON probes. ---
    Q("q54_variant",
      """WITH r AS (
        |  SELECT event_type,
        |    '{"p": ' || props || ', "u": ' || CAST(user_id AS VARCHAR) || '}'
        |      AS j
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(j, '$.p.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  CAST(sum(CAST(json_extract_string(j, '$.u') AS BIGINT))
        |    AS BIGINT) AS sum_u,
        |  CAST(sum(CASE WHEN json_extract_string(j, '$.missing') IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |FROM r GROUP BY event_type
        |ORDER BY event_type""") { (s, dir) =>
      val j = concat(lit("{\"p\": "), col("props"),
        lit(", \"u\": "), col("user_id").cast("string"), lit("}"))
      t(s, dir, "events")
        .select(col("event_type"), parse_json(j).as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(variant_get(col("v"), "$.p.k", "long")).as("sum_k"),
          sum(variant_get(col("v"), "$.u", "long")).as("sum_u"),
          sum(when(try_variant_get(col("v"), "$.missing", "long").isNull,
            1L).otherwise(0L)).as("n_missing"))
        .orderBy("event_type")
    },

    // Discrete percentiles (percentile_disc / WITHIN GROUP — the
    // SQL:2008 inverse-distribution aggregate q48's percentile_cont
    // family lacks): returns an ACTUAL group element (smallest value
    // whose cume_dist ≥ fraction), so unlike the interpolated family
    // there is no arithmetic at all to diverge cross-engine — the only
    // parity surface is the index rule itself, which this query pins
    // at three fractions over every o_orderpriority group size. median()
    // rides along as the dedicated 0.5-interpolation surface (exact on
    // integer cents: .0/.5 fractions are IEEE-exact). Same plan shape
    // as q48: one ObjectHashAggregate pass, percentile buffers a
    // value→count map per group (value-cardinality-bounded, not
    // row-bounded).
    Q("q55_percentile_disc",
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  round(CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
        |    0.25) AS DOUBLE) / 100.0, 2) AS p25_disc,
        |  round(CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
        |    0.50) AS DOUBLE) / 100.0, 2) AS p50_disc,
        |  round(CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT),
        |    0.75) AS DOUBLE) / 100.0, 2) AS p75_disc,
        |  round(CAST(median(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS DOUBLE) / 100.0, 4) AS p50_cont
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
            .as("d25"),
          expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)")
            .as("d50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)")
            .as("d75"),
          median(col("cents")).as("m"))
        .select(col("o_orderpriority"), col("n"),
          duckRound(col("d25").cast("double") / 100.0, 2).as("p25_disc"),
          duckRound(col("d50").cast("double") / 100.0, 2).as("p50_disc"),
          duckRound(col("d75").cast("double") / 100.0, 2).as("p75_disc"),
          duckRound(col("m") / 100.0, 4).as("p50_cont"))
        .orderBy("o_orderpriority")
    },

    // --- WINSORIZATION (percentile clipping — the standard numeric-
    //     feature cleaning step: clamp a value column to its per-group
    //     [p05, p95] so heavy-tail outliers stop dominating means and
    //     gradients): inherently TWO-PASS — pass 1 computes the
    //     boundaries (one exact-percentile aggregate per group, the
    //     q48 single-agg buffer note applies), pass 2 re-scans with the
    //     groups-sized boundary frame BROADCAST and clamps map-side
    //     into a partial aggregate. Parity: percentiles run over
    //     integer CENTS (the q48 device), so the interpolated boundary
    //     is the same double in both engines and a clamp decision can
    //     never flip; the means are round-4 displays. Reports n_lo/n_hi
    //     (clipped counts) next to the before/after means so the
    //     operator's effect is visible. ---
    Q("q56_winsorize",
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag,
        |    CAST(quantile_cont(v, 0.05) AS DOUBLE) AS lo,
        |    CAST(quantile_cont(v, 0.95) AS DOUBLE) AS hi
        |  FROM c GROUP BY l_returnflag)
        |SELECT c.l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN CAST(c.v AS DOUBLE) < b.lo
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN CAST(c.v AS DOUBLE) > b.hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  round(avg(CAST(c.v AS DOUBLE)) / 100.0, 4) AS mean_raw,
        |  round(avg(greatest(b.lo, least(b.hi, CAST(c.v AS DOUBLE))))
        |        / 100.0, 4) AS mean_winsor
        |FROM c JOIN b ON b.l_returnflag = c.l_returnflag
        |GROUP BY c.l_returnflag
        |ORDER BY c.l_returnflag""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // ONE corpus pass (the q58 value-count device): collapse to
      // per-(group, value) counts, boundaries via percentile's
      // frequency overload (bit-identical buffer math), then clamp and
      // average over the value-cardinality-bounded frame — the raw mean
      // is an exact integer sum either way, and the winsorized mean
      // accumulates each clipped boundary as one product instead of
      // cnt repeated additions.
      val vc = t(s, dir, "lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
        .groupBy("l_returnflag", "v").agg(count(lit(1)).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val b = vc.groupBy("l_returnflag")
        .agg(percentile(col("v"), array(lit(0.05), lit(0.95)), col("cnt"))
          .as("ps"))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("lo"),
          element_at(col("ps"), 2).as("hi"))
      val vd = col("v").cast("double")
      val cd = col("cnt").cast("double")
      vc.join(broadcast(b), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(sum(col("cnt")).as("n"),
          sum(when(vd < col("lo"), col("cnt")).otherwise(0L)).as("n_lo"),
          sum(when(vd > col("hi"), col("cnt")).otherwise(0L)).as("n_hi"),
          duckRound(sum(vd * cd) / sum(cd) / 100.0, 4).as("mean_raw"),
          duckRound(sum(greatest(col("lo"), least(col("hi"), vd)) * cd)
            / sum(cd) / 100.0, 4).as("mean_winsor"))
        .orderBy("l_returnflag")
    },

    // --- approx_percentile (GK/KLL-family sketch) with its RANK-ERROR
    //     guarantee verified in-band — the third sketch after q23's
    //     HLL and tx20's Misra–Gries to get this treatment: the
    //     returned value is implementation-defined, but the contract
    //     — |rank(returned) − q·n| ≤ n/accuracy — is checkable with
    //     one extra rank-counting pass (a 3-row broadcast back onto
    //     the scan, then strictly-below / at-or-below counts bracket
    //     the target rank; +1 absorbs the boundary tie). Exact
    //     per-group counts carry the hash; the booleans attest the
    //     sketch held its bound. ---
    Q("q57_percentile_approx",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS p50_ok, TRUE AS p90_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
      val ag = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("ap90"))
      val err = col("n").cast("double") / 1000.0 + 1.0
      li.join(broadcast(ag), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(first(col("n")).as("n"),
          sum(when(col("l_extendedprice") < col("ap50"), 1L)
            .otherwise(0L)).as("lt50"),
          sum(when(col("l_extendedprice") <= col("ap50"), 1L)
            .otherwise(0L)).as("le50"),
          sum(when(col("l_extendedprice") < col("ap90"), 1L)
            .otherwise(0L)).as("lt90"),
          sum(when(col("l_extendedprice") <= col("ap90"), 1L)
            .otherwise(0L)).as("le90"))
        .select(col("l_returnflag"), col("n"),
          (col("lt50").cast("double") <= col("n") * 0.5 + err &&
            col("le50").cast("double") >= col("n") * 0.5 - err)
            .as("p50_ok"),
          (col("lt90").cast("double") <= col("n") * 0.9 + err &&
            col("le90").cast("double") >= col("n") * 0.9 - err)
            .as("p90_ok"))
        .orderBy("l_returnflag")
    },

    // --- ROBUST per-group outlier detection via MAD (median absolute
    //     deviation): mean±k·stddev (q34's moments) is itself dragged
    //     by the outliers it is supposed to flag; median±3·MAD is the
    //     standard robust alternative quality pipelines use on
    //     heavy-tailed size/price/length columns. Inherently THREE
    //     corpus passes (median → MAD needs the median → count needs
    //     both) over a persisted 2-column frame — the q56 multi-pass
    //     class, with group-cardinality medians broadcast between
    //     passes. Cross-engine exactness by the q48 device: medians
    //     run on integer CENTS (interpolation at 0.5 is (a+b)/2 —
    //     exact for longs), deviations are doubled into integers
    //     (|2c − 2·med| absorbs med's .5 grain), so med/MAD/threshold
    //     are all dyadic-exact and the >3·MAD comparison can never
    //     ULP-flip between engines. ---
    Q("q58_mad_outliers",
      """WITH x AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(quantile_cont(c, 0.5) AS DOUBLE) AS med
        |  FROM x GROUP BY l_returnflag),
        |d AS (
        |  SELECT x.l_returnflag, x.c,
        |    abs(2 * x.c - CAST(2 * m.med AS BIGINT)) AS dev2
        |  FROM x JOIN m USING (l_returnflag)),
        |md AS (
        |  SELECT l_returnflag, CAST(quantile_cont(dev2, 0.5) AS DOUBLE) AS mad2
        |  FROM d GROUP BY l_returnflag)
        |SELECT d.l_returnflag, m.n,
        |  round(m.med / 100.0, 4) AS med_price,
        |  round(md.mad2 / 200.0, 4) AS mad_price,
        |  CAST(sum(CASE WHEN CAST(d.dev2 AS DOUBLE) > 3.0 * md.mad2
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN CAST(d.dev2 AS DOUBLE) > 3.0 * md.mad2
        |           THEN 1 ELSE 0 END) AS DOUBLE) / CAST(m.n AS DOUBLE), 6)
        |    AS outlier_frac
        |FROM d JOIN m USING (l_returnflag) JOIN md USING (l_returnflag)
        |GROUP BY d.l_returnflag, m.n, m.med, md.mad2
        |ORDER BY d.l_returnflag""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // ONE corpus pass: collapse to per-(group, value) COUNTS first (a
      // codegen hash aggregate), then run every later pass — both
      // medians via percentile's frequency overload (bit-identical: the
      // aggregate's internal buffer IS a value→count map) and the
      // outlier count — over the value-cardinality-bounded frame. The
      // previous shape re-walked all corpus rows three times through
      // ObjectHashAggregate buffers; dev2 depends only on (group, c),
      // so rows never needed to survive pass 1.
      val vc = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("c"))
        .groupBy("l_returnflag", "c").agg(count(lit(1)).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = vc.groupBy("l_returnflag").agg(
        sum(col("cnt")).as("n"),
        percentile(col("c"), lit(0.5), col("cnt")).as("med"))
      val d = vc.join(broadcast(m), Seq("l_returnflag"))
        .withColumn("dev2",
          abs(col("c") * 2 - (col("med") * 2).cast("long")))
      val md = d.groupBy("l_returnflag")
        .agg(percentile(col("dev2"), lit(0.5), col("cnt")).as("mad2"))
      d.join(broadcast(md), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(first(col("n")).as("n"),
          duckRound(first(col("med")) / 100.0, 4).as("med_price"),
          duckRound(first(col("mad2")) / 200.0, 4).as("mad_price"),
          sum(when(col("dev2").cast("double") > col("mad2") * 3.0,
            col("cnt")).otherwise(0L)).as("n_outliers"))
        .select(col("l_returnflag"), col("n"), col("med_price"),
          col("mad_price"), col("n_outliers"),
          duckRound(col("n_outliers").cast("double") /
            col("n").cast("double"), 6).as("outlier_frac"))
        .orderBy("l_returnflag")
    },

    // --- FILTER-clause conditional aggregation: several differently-
    //     filtered aggregates of the SAME scan in ONE pass — the ANSI
    //     `agg(...) FILTER (WHERE ...)` surface (and Spark's count_if
    //     shorthand), which replaces the self-join-per-condition
    //     anti-pattern with per-row predicate routing inside one
    //     hash aggregate. Conditional means use the exact-integer
    //     device (cents sum / count, one division) so partial-merge
    //     order can't move the round-4 hash. ---
    Q("q59_filtered_aggs",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)
        |    AS n_bulk,
        |  CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_discount > 0.05)
        |    AS BIGINT) AS n_discount_supp,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_tax = 0) AS BIGINT) AS taxfree_cents,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |          FILTER (WHERE l_quantity >= 25) AS DOUBLE)
        |    / CAST(greatest(count(*) FILTER (WHERE l_quantity >= 25), 1)
        |        AS DOUBLE) / 100.0, 4) AS mean_bulk_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      val cents = round(col("l_extendedprice") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          count_if(col("l_quantity") >= 25).as("n_bulk"),
          expr("count(DISTINCT l_suppkey) FILTER (WHERE l_discount > 0.05)")
            .as("n_discount_supp"),
          sum(when(col("l_tax") === 0, cents)).as("taxfree_cents"),
          sum(when(col("l_quantity") >= 25, cents)).as("bulk_cents"))
        .select(col("l_returnflag"), col("n"), col("n_bulk"),
          col("n_discount_supp"), col("taxfree_cents"),
          duckRound(col("bulk_cents").cast("double") /
            greatest(col("n_bulk"), lit(1L)).cast("double") / 100.0, 4)
            .as("mean_bulk_price"))
        .orderBy("l_returnflag")
    },

    // --- ROLLING exact median (q60 — the windowed ordered-set
    //     aggregate: q48/q55/q58 compute percentiles per GROUP, this
    //     computes one per ROW over a bounded trailing frame — the
    //     moving-median smoother every monitoring/anomaly stack runs
    //     where a moving MEAN would chase the outliers it should
    //     suppress). Exactness: medians over integer cents, the 0.5
    //     interpolation point averages two integers → .0/.5 doubles,
    //     IEEE-exact on both engines (the q48 device in a window
    //     frame). Scale shape: the window partitions by customer
    //     (bounded orders per key, never corpus-wide) with a 5-row
    //     frame, so per-row work is O(frame); one hash exchange on
    //     o_custkey + the output sort. ---
    Q("q60_rolling_median",
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CAST(n_win AS BIGINT) AS n_win,
        |  round(med / 100.0, 4) AS rolling_median
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    count(*) OVER w AS n_win,
        |    CAST(median(CAST(round(o_totalprice * 100) AS BIGINT))
        |      OVER w AS DOUBLE) AS med
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |ORDER BY o_orderkey""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // Spark refuses a frame on median()/percentile() — the rolling
      // median materializes the ≤5-value frame via collect_list (frames
      // ARE allowed there) and takes the median in-row from the sorted
      // array: an independent encoding against DuckDB's native windowed
      // median, agreeing exactly because both average two integers
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, Window.currentRow)
      val vs = col("vs")
      val n = size(vs)
      val med = when(n % 2 === 1,
          element_at(vs, ((n + 1) / 2).cast("int")).cast("double"))
        .otherwise((element_at(vs, (n / 2).cast("int")) +
            element_at(vs, (n / 2).cast("int") + 1))
          .cast("double") / 2.0)
      t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          array_sort(collect_list(col("cents")).over(w)).as("vs"))
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          n.cast("long").as("n_win"),
          duckRound(med / 100.0, 4).as("rolling_median"))
        .orderBy("o_orderkey")
    },

    // --- Mergeable distinct-count sketches (q61 — the Datasketches
    //     HLL surface, Spark 4's hll_sketch_agg/hll_union_agg): where
    //     q23's approx_count_distinct is a one-shot aggregate, this is
    //     the PRE-AGGREGATION pattern a 100 TB deployment actually
    //     runs — build one tiny sketch per (key, day) partition once,
    //     then answer any later rollup (per key across days, across
    //     keys, rolling windows) by UNIONING sketches, never
    //     re-scanning rows. Union is associative/commutative/
    //     idempotent, so late data folds in and re-unions are safe.
    //     Correctness gate: in-band attestation (the q23/q57 device) —
    //     the day-sketch union's estimate must land within the HLL
    //     error envelope of the exact distinct (lgK=12 → RSE 1.63%;
    //     4σ = 6.5%, plus a small-count floor), and the oracle pins
    //     the exact side + `TRUE`. Scale shape: two map-side partial
    //     aggs over events (sketch build; exact distinct for the
    //     gate), a (keys×days)-sized sketch shuffle, broadcast-sized
    //     join of two key-cardinality frames. At 100 TB the exact side
    //     disappears and ONLY the sketch path runs — see SketchStore
    //     for the build-once/serve-many artifact + its maintainer. ---
    Q("q61_distinct_sketch",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS sketch_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""") { (s, dir) =>
      val e = t(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          date_trunc("DAY", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val unioned = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(
          hll_union_agg(col("sk"), lit(false))).as("approx"))
      e.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_exact"))
        .join(unioned, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("approx") - col("n_exact")).cast("double") <=
            greatest(col("n_exact").cast("double") * lit(0.065),
              lit(8.0))).as("sketch_ok"))
        .orderBy("event_type")
    },

    // --- Distinct users over a trailing 7-day window, served from the
    //     SketchStore artifact (q62 — q61's build-once/serve-many
    //     twin, the tx18/sm13 pattern applied to sketches): the window
    //     rollup unions ONLY the stored day sketches inside the
    //     window — a partition-pruned scan of (keys × 7) ~4 KB rows —
    //     and never touches the event log. The exact side exists
    //     purely as the correctness gate (in-band attestation, q23's
    //     device); at 100 TB only the sketch path runs. ---
    Q("q62_distinct_from_store",
      """WITH mx AS (
        |  SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS md
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS sketch_ok
        |FROM events, mx
        |WHERE CAST(date_trunc('day', ts) AS DATE) >= md - 6
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, dir) =>
      val e = t(s, dir, "events")
      val name = graft.index.SketchStore.tableFor(s, dir)
      // 1-row bounded collect (the centroid/probe class): a LITERAL
      // cutoff statically prunes the store scan to the window's day
      // partitions, which a join-shaped filter could not promise
      val cutoff = e
        .agg(date_sub(to_date(date_trunc("DAY", max(col("ts")))), 6)
          .as("cut"))
        .head().getDate(0)
      val served = graft.index.SketchStore.serveDistinct(s, name,
        fromDay = Some(lit(cutoff)))
      e.filter(to_date(date_trunc("DAY", col("ts"))) >= lit(cutoff))
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_exact"))
        .join(served, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_distinct_est") - col("n_exact")).cast("double") <=
            greatest(col("n_exact").cast("double") * lit(0.065),
              lit(8.0))).as("sketch_ok"))
        .orderBy("event_type")
    },

    // --- Session TRANSITION matrix (q63 — the Markov step of the
    //     journey-analysis family: q27 finds the sessions, q52 matches
    //     an ORDERED funnel through them, this measures where users GO
    //     NEXT — P(to_type | from_type) over consecutive events inside
    //     one session; the "what follows a view" table every product
    //     stack keeps): sessions are q27's 30-min-gap islands (the
    //     gaps-and-islands chain, gap STRICTLY greater starts a new
    //     session — the pinned edge semantics), transitions pair each
    //     event with its in-session successor via lead(); boundaries
    //     contribute nothing (the last event of a session has no
    //     successor — cross-session pairs would fabricate journeys
    //     across hours of absence). Exactness: transition counts are
    //     integers (they carry the oracle hash); probabilities are one
    //     integer division rounded on both sides; gap comparison on
    //     exact MICROSECONDS (a seconds cast would truncate the edge).
    //     Scale shape: two narrow window passes over per-USER
    //     partitions (bounded events per user — never corpus-wide) and
    //     a types²-cardinality final aggregate; one hash exchange on
    //     user_id feeds both windows (same partitioning, no re-
    //     exchange), nothing wide ever shuffles. ---
    Q("q63_session_transitions",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id) AS to_type
        |  FROM sess)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) /
        |    sum(count(*)) OVER (PARTITION BY from_type), 6) AS p
        |FROM tr WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = lit(1800L * 1000000L)
      val marked = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) -
              unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1L)
            .otherwise(0L).as("new_sess"))
      val sess = marked.withColumn("sid",
        sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val w2 = Window.partitionBy("user_id", "sid")
        .orderBy("ts", "event_id")
      val tr = sess.select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w2).as("to_type"))
        .filter(col("to_type").isNotNull)
      val wFrom = Window.partitionBy("from_type")
      tr.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
        .select(col("from_type"), col("to_type"), col("n"),
          duckRound(col("n").cast("double") /
            sum(col("n")).over(wFrom), 6).as("p"))
        .orderBy("from_type", "to_type")
    },

    // --- Week-over-week RETENTION from sketch ALGEBRA (q64 — the
    //     INTERSECTION estimate q61's unions can't give directly: HLL
    //     has no intersect, so retention |users(w) ∩ users(w+1)| comes
    //     by inclusion-exclusion over three union-able sketches,
    //     |A| + |B| − |A∪B| — the canonical cohort-retention recipe
    //     over pre-aggregated sketches, answering "how many of last
    //     week's users came back" from (keys × weeks) tiny rows
    //     instead of two event-log scans per week pair). Error
    //     compounds (three ±1.63% estimates against a possibly-small
    //     intersection), so the attested envelope is wider — 12% of
    //     the exact UNION plus a small-count floor — and the exact
    //     intersection (one distinct-pairs self-join) carries the
    //     oracle hash. Scale shape: weekly sketches are one rollup;
    //     adjacent weeks pair by an equi-join on a materialized
    //     next-week key (no interval inequality); the exact side's
    //     self-join keys on (type, user, week+7) — all hash joins. ---
    Q("q64_retention_sketch",
      """WITH wu AS (
        |  SELECT DISTINCT event_type, date_trunc('week', ts) AS week,
        |    user_id
        |  FROM events),
        |wk AS (
        |  SELECT event_type, week,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM wu GROUP BY event_type, week),
        |ret AS (
        |  SELECT a.event_type, a.week,
        |    CAST(count(*) AS BIGINT) AS n_retained
        |  FROM wu a JOIN wu b
        |    ON a.event_type = b.event_type AND a.user_id = b.user_id
        |   AND b.week = a.week + INTERVAL 7 DAY
        |  GROUP BY a.event_type, a.week)
        |SELECT r.event_type, r.week, r.n_retained,
        |  ka.n_users AS n_week, kb.n_users AS n_next_week,
        |  TRUE AS sketch_ok
        |FROM ret r
        |JOIN wk ka ON ka.event_type = r.event_type AND ka.week = r.week
        |JOIN wk kb ON kb.event_type = r.event_type
        |          AND kb.week = r.week + INTERVAL 7 DAY
        |ORDER BY r.event_type, r.week""") { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_type"),
          date_trunc("WEEK", col("ts")).as("week"), col("user_id"))
      // one weekly rollup carries BOTH the sketch and the exact count;
      // persisted — it feeds both the week and next-week join sides,
      // and unpersisted each side re-ran the HLL sketch build over
      // the full event scan
      val wk = e.groupBy("event_type", "week")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          count_distinct(col("user_id")).as("n_users"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val a = wk.select(col("event_type"), col("week"), col("sk"),
        col("n_users"),
        (col("week") + expr("INTERVAL 7 DAYS")).as("next_week"))
      val b = wk.select(col("event_type").as("b_type"),
        col("week").as("b_week"), col("sk").as("b_sk"),
        col("n_users").as("n_next_week"))
      val pairs = a.join(b,
        col("event_type") === col("b_type") &&
          col("next_week") === col("b_week"))
        .select(col("event_type"), col("week"),
          col("n_users").as("n_week"), col("n_next_week"),
          (hll_sketch_estimate(col("sk")) +
            hll_sketch_estimate(col("b_sk")) -
            hll_sketch_estimate(hll_union(col("sk"), col("b_sk"))))
            .as("est_retained"))
      // persisted: the deduped activity frame feeds both sides of the
      // retention self-join — unpersisted, the distinct ran twice
      val wu = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val wuNext = wu.select(col("event_type").as("y_type"),
        (col("week") - expr("INTERVAL 7 DAYS")).as("y_week"),
        col("user_id").as("y_user"))
      val ret = wu.join(wuNext,
          col("event_type") === col("y_type") &&
            col("week") === col("y_week") &&
            col("user_id") === col("y_user"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("n_retained"))
      ret.join(pairs, Seq("event_type", "week"))
        .select(col("event_type"), col("week"), col("n_retained"),
          col("n_week"), col("n_next_week"),
          (abs(col("est_retained") - col("n_retained")).cast("double") <=
            greatest((col("n_week") + col("n_next_week") -
              col("n_retained")).cast("double") * lit(0.12),
              lit(16.0))).as("sketch_ok"))
        .orderBy("event_type", "week")
    },

    // --- Retention via NATIVE Theta-sketch intersection (q65 — q64's
    //     tighter twin and the fifth sketch family: a Theta sketch is
    //     a uniform hash SAMPLE of the set, so intersection is a
    //     first-class operation with ONE estimate instead of q64's
    //     three-term inclusion-exclusion; Datasketches theta, the
    //     library Spark's own HLL functions ship with). Built by one
    //     mapGroups pass with bounded per-group state (≤ 2^12 retained
    //     hashes whatever streams through — the KeyValueGroupedDataset
    //     custom-state recipe); below 4096 distinct users per (type,
    //     week) the sketch is in EXACT mode, past it sampling starts,
    //     so the attested envelope is 8% of the exact union + a floor
    //     (tighter than q64's 12% — the single-estimate advantage the
    //     query exists to exhibit). Same oracle as q64: serving from a
    //     different sketch family must not change the answer. ---
    Q("q65_theta_retention",
      """WITH wu AS (
        |  SELECT DISTINCT event_type, date_trunc('week', ts) AS week,
        |    user_id
        |  FROM events),
        |wk AS (
        |  SELECT event_type, week,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM wu GROUP BY event_type, week),
        |ret AS (
        |  SELECT a.event_type, a.week,
        |    CAST(count(*) AS BIGINT) AS n_retained
        |  FROM wu a JOIN wu b
        |    ON a.event_type = b.event_type AND a.user_id = b.user_id
        |   AND b.week = a.week + INTERVAL 7 DAY
        |  GROUP BY a.event_type, a.week)
        |SELECT r.event_type, r.week, r.n_retained,
        |  ka.n_users AS n_week, kb.n_users AS n_next_week,
        |  TRUE AS sketch_ok
        |FROM ret r
        |JOIN wk ka ON ka.event_type = r.event_type AND ka.week = r.week
        |JOIN wk kb ON kb.event_type = r.event_type
        |          AND kb.week = r.week + INTERVAL 7 DAY
        |ORDER BY r.event_type, r.week""") { (s, dir) =>
      val e = t(s, dir, "events")
      val est = graft.operators.ThetaSketch.weeklyRetention(e)
      // persisted: consumed by the weekly counts AND both sides of
      // the retention self-join — unpersisted, the distinct pass over
      // events ran three times
      val wu = e.select(col("event_type"),
        date_trunc("WEEK", col("ts")).as("week"), col("user_id"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val wk = wu.groupBy("event_type", "week")
        .agg(count(lit(1)).as("n_users"))
      val wuNext = wu.select(col("event_type").as("y_type"),
        (col("week") - expr("INTERVAL 7 DAYS")).as("y_week"),
        col("user_id").as("y_user"))
      val ret = wu.join(wuNext,
          col("event_type") === col("y_type") &&
            col("week") === col("y_week") &&
            col("user_id") === col("y_user"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("n_retained"))
      val kb = wk.select(col("event_type").as("k_type"),
        (col("week") - expr("INTERVAL 7 DAYS")).as("k_week"),
        col("n_users").as("n_next_week"))
      ret
        .join(wk, Seq("event_type", "week"))
        .join(kb, col("event_type") === col("k_type") &&
          col("week") === col("k_week"))
        .join(est, Seq("event_type", "week"))
        .select(col("event_type"), col("week"), col("n_retained"),
          col("n_users").as("n_week"), col("n_next_week"),
          (abs(col("est_retained") - col("n_retained")).cast("double") <=
            greatest((col("n_users") + col("n_next_week") -
              col("n_retained")).cast("double") * lit(0.08),
              lit(12.0))).as("sketch_ok"))
        .orderBy("event_type", "week")
    },

    // --- Approximate query processing by DETERMINISTIC sampling (q66
    //     — the BlinkDB recipe, the third approximation axis after
    //     sketches (q23/q61...) and approx-percentile (q57): answer an
    //     aggregate from a fixed hash-SAMPLE of the fact table and
    //     quote the CLT error bar. The sample membership is an md5
    //     coin on the row key (pl03's device), NOT rand() — so the
    //     sample is a stable, re-runnable TABLE both engines construct
    //     identically, which is what makes the scaled estimates
    //     themselves hash-comparable (and, at 100 TB, what lets a
    //     deployment MATERIALIZE the sample once and answer every
    //     later explore-query from 10% of the bytes). Estimates are
    //     exact integers (cents × 1/s with s = 10% — no float
    //     surface); the CLT attestations (4σ: binomial-thinning
    //     variance n·(1−s)/s for counts, (1/s−1)·Σc² for sums) ride
    //     in-band as booleans. Scale shape: one scan, two partial
    //     aggregates (full + FILTER-masked), group-cardinality output
    //     — the exact side exists only as the gate; production scans
    //     the materialized sample. ---
    Q("q66_sampled_revenue",
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR) ||
        |      '#' || CAST(l_linenumber AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 100 < 10 AS in_s
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents_exact,
        |  CAST(10 * count(*) FILTER (WHERE in_s) AS BIGINT) AS n_est,
        |  CAST(10 * coalesce(sum(cents) FILTER (WHERE in_s), 0)
        |    AS BIGINT) AS sum_cents_est,
        |  TRUE AS n_ok, TRUE AS sum_ok
        |FROM s GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val inS = conv(substring(md5(concat(
          col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 100 < 10
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), cents.as("cents"), inS.as("in_s"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_exact"),
          sum(col("cents")).as("sum_cents_exact"),
          (lit(10L) * count(when(col("in_s"), lit(1)))).as("n_est"),
          (lit(10L) * coalesce(sum(when(col("in_s"), col("cents"))),
            lit(0L))).as("sum_cents_est"),
          // 4σ CLT bands: Var(n_est) = n(1−s)/s = 9n at s = 0.1;
          // Var(sum_est) = (1/s − 1)·Σc² = 9·Σc² (doubles — bound
          // math only, the booleans are what compare)
          sum(col("cents").cast("double") * col("cents").cast("double"))
            .as("sq"))
        .select(col("l_returnflag"), col("n_exact"),
          col("sum_cents_exact"), col("n_est"), col("sum_cents_est"),
          (abs(col("n_est") - col("n_exact")).cast("double") <=
            lit(4.0) * sqrt(lit(9.0) * col("n_exact").cast("double")))
            .as("n_ok"),
          (abs(col("sum_cents_est") - col("sum_cents_exact"))
            .cast("double") <= lit(4.0) * sqrt(lit(9.0) * col("sq")))
            .as("sum_ok"))
        .orderBy("l_returnflag")
    }
  )
}
