package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** The reference's 13 analytics workloads (`/root/reference/scripts/Data
  * Analytics/01..13_*.sql`) re-expressed Spark-first over the testdata star
  * schema. Each entry has a matching DuckDB oracle (SparkEntry contract).
  *
  * Determinism rules (oracle hash-compare):
  *  - every SUM over doubles goes through DECIMAL(18,4) first (exact,
  *    order-independent) and is surfaced with CAST(... AS DOUBLE);
  *  - derived doubles only via arithmetic on already-identical doubles;
  *  - no ROUND anywhere; every query ends in a total ORDER BY.
  */
object CoreQueries {

  type QFn = (SparkSession, String) => DataFrame

  /** Exact order-independent sum of a double expression (see header). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4)))

  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1 - l_discount)"
  private def dsumSql(x: String) = s"SUM(CAST($x AS DECIMAL(18,4)))"

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // q01 — dimension exploration: DISTINCT over region ⋈ nation
  // (ref: 02_dimensions_exploration.sql; operators P4, O1, J2)
  private val q01: QFn = (s, dir) =>
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"))
      .distinct()
      .orderBy("r_name", "n_name")

  private val q01Sql =
    """SELECT DISTINCT r_name, n_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY r_name, n_name""".stripMargin

  // q02 — date range exploration: MIN/MAX + T-SQL-style DATEDIFF(month)
  // boundary counting (ref: 03_date_range_exploration.sql; A1, §2.8 date note)
  private def monthsBetweenBoundary(a: Column, b: Column): Column =
    (year(b) * lit(12) + month(b)) - (year(a) * lit(12) + month(a))

  private val q02: QFn = (s, dir) =>
    t(s, dir, "orders").agg(
      min("o_orderdate").as("first_order"),
      max("o_orderdate").as("last_order"),
      monthsBetweenBoundary(min("o_orderdate"), max("o_orderdate"))
        .cast("long").as("span_months"))

  private val q02Sql =
    """SELECT min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
      |CAST((year(max(o_orderdate))*12 + month(max(o_orderdate)))
      |   - (year(min(o_orderdate))*12 + month(min(o_orderdate))) AS BIGINT) AS span_months
      |FROM orders""".stripMargin

  // q03 — KPI measures report: scalar aggregates stacked with UNION ALL
  // (ref: 04_measures_exploration.sql; A1, A2, A8, U1)
  private val q03: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    val c = t(s, dir, "customer"); val p = t(s, dir, "part")
    def m(name: String, v: Column, from: DataFrame): DataFrame =
      from.agg(v.cast("double").as("measure_value"))
        .select(lit(name).as("measure_name"), col("measure_value"))
    m("total_revenue", dsum(revenue), li)
      .unionByName(m("total_quantity", dsum(col("l_quantity")), li))
      .unionByName(m("total_lineitems", count(lit(1)), li))
      .unionByName(m("total_orders", count(lit(1)), o))
      .unionByName(m("distinct_order_status", countDistinct(col("o_orderstatus")), o))
      .unionByName(m("total_customers", count(lit(1)), c))
      .unionByName(m("total_parts", count(lit(1)), p))
      .orderBy("measure_name")
  }

  private val q03Sql =
    s"""SELECT 'total_revenue' AS measure_name, CAST(${dsumSql(revenueSql)} AS DOUBLE) AS measure_value FROM lineitem
       |UNION ALL SELECT 'total_quantity', CAST(${dsumSql("l_quantity")} AS DOUBLE) FROM lineitem
       |UNION ALL SELECT 'total_lineitems', CAST(COUNT(*) AS DOUBLE) FROM lineitem
       |UNION ALL SELECT 'total_orders', CAST(COUNT(*) AS DOUBLE) FROM orders
       |UNION ALL SELECT 'distinct_order_status', CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) FROM orders
       |UNION ALL SELECT 'total_customers', CAST(COUNT(*) AS DOUBLE) FROM customer
       |UNION ALL SELECT 'total_parts', CAST(COUNT(*) AS DOUBLE) FROM part
       |ORDER BY measure_name""".stripMargin

  // q04 — magnitude: customers and balances by nation
  // (ref: 05_magnitude_analysis.sql; A3, J2)
  private val q04: QFn = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("total_customers"),
           dsum(col("c_acctbal")).cast("double").as("total_acctbal"))
      .orderBy("n_name")

  private val q04Sql =
    s"""SELECT n_name, COUNT(*) AS total_customers,
       |CAST(${dsumSql("c_acctbal")} AS DOUBLE) AS total_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // q05 — magnitude: revenue and quantity by part type (A3, J2)
  private val q05: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(dsum(revenue).cast("double").as("revenue"),
           dsum(col("l_quantity")).cast("double").as("total_qty"))
      .orderBy("p_type")

  private val q05Sql =
    s"""SELECT p_type, CAST(${dsumSql(revenueSql)} AS DOUBLE) AS revenue,
       |CAST(${dsumSql("l_quantity")} AS DOUBLE) AS total_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_type ORDER BY p_type""".stripMargin

  // q06 — ranking: top-5 parts by revenue, RANK() so ties are kept
  // (ref: 06_ranking_analysis.sql; W3, O3 — tie semantics differ from
  // LIMIT). Two-phase TopK: the unpartitioned rank window only ever sees
  // the per-partition survivors, never the full per-part aggregate —
  // the 100×-cardinality-safe form of the same semantics.
  private val q06: QFn = (s, dir) => {
    val pr = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_name")
      .agg(dsum(revenue).as("rev"))
    graft.operators.TopK.rankTopK(pr, 5, Seq(col("rev").desc))
      .select(col("p_name"), col("rev").cast("double").as("revenue"),
              col("rnk").cast("long").as("rnk"))
      .orderBy("rnk", "p_name")
  }

  private val q06Sql =
    s"""WITH pr AS (SELECT p_name, ${dsumSql(revenueSql)} AS rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_name)
       |SELECT p_name, CAST(rev AS DOUBLE) AS revenue, CAST(rnk AS BIGINT) AS rnk
       |FROM (SELECT p_name, rev, RANK() OVER (ORDER BY rev DESC) AS rnk FROM pr) x
       |WHERE rnk <= 5 ORDER BY rnk, p_name""".stripMargin

  // q07 — top-10 customers by spend via ORDER BY + LIMIT (O2)
  private val q07: QFn = (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(dsum(col("o_totalprice")).cast("double").as("total_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(10)

  private val q07Sql =
    s"""SELECT c_custkey, c_name, CAST(${dsumSql("o_totalprice")} AS DOUBLE) AS total_spend
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin

  // q08 — change over time: orders/revenue by year+month of o_orderdate
  // (ref: 07_change_over_time_analysis.sql; A4 group-by-expression)
  private val q08: QFn = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"),
               month(col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).cast("double").as("revenue"))
      .orderBy("order_year", "order_month")

  private val q08Sql =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       |CAST(month(o_orderdate) AS INT) AS order_month,
       |COUNT(*) AS n_orders, CAST(${dsumSql("o_totalprice")} AS DOUBLE) AS revenue
       |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q09 — cumulative analysis: monthly revenue, running total, running avg
  // (ref: 08_cumulative_analysis.sql; W4, W5, A4 via date_trunc)
  private val q09: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy("order_month")
    m.select(
        col("order_month"),
        col("rev").cast("double").as("monthly_revenue"),
        sum(col("rev")).over(w).cast("double").as("running_revenue"),
        (sum(col("rev")).over(w).cast("double") / row_number().over(w))
          .as("running_avg_revenue"))
      .orderBy("order_month")
  }

  private val q09Sql =
    s"""WITH m AS (SELECT date_trunc('month', o_orderdate) AS order_month,
       |  ${dsumSql("o_totalprice")} AS rev FROM orders GROUP BY 1)
       |SELECT order_month, CAST(rev AS DOUBLE) AS monthly_revenue,
       |CAST(SUM(rev) OVER (ORDER BY order_month) AS DOUBLE) AS running_revenue,
       |CAST(SUM(rev) OVER (ORDER BY order_month) AS DOUBLE)
       |  / (ROW_NUMBER() OVER (ORDER BY order_month)) AS running_avg_revenue
       |FROM m ORDER BY order_month""".stripMargin

  // q10 — YoY performance by brand: LAG delta, whole-partition average,
  // CASE trend labels (ref: 09_performance_analysis.sql; W6, W7, P5)
  private val q10: QFn = (s, dir) => {
    val b = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("ship_year"))
      .agg(dsum(revenue).as("rev"))
    val wp = Window.partitionBy("p_brand")
    val wo = Window.partitionBy("p_brand").orderBy("ship_year")
    val prev = lag(col("rev"), 1).over(wo)
    b.select(
        col("p_brand"), col("ship_year"),
        col("rev").cast("double").as("revenue"),
        (sum(col("rev")).over(wp).cast("double") / count(lit(1)).over(wp))
          .as("avg_brand_revenue"),
        (col("rev") - prev).cast("double").as("yoy_delta"),
        when(prev.isNull, "n/a")
          .when(col("rev") > prev, "Increase")
          .when(col("rev") < prev, "Decrease")
          .otherwise("No Change").as("trend"))
      .orderBy("p_brand", "ship_year")
  }

  private val q10Sql =
    s"""WITH b AS (SELECT p_brand, CAST(year(l_shipdate) AS INT) AS ship_year,
       |  ${dsumSql(revenueSql)} AS rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
       |SELECT p_brand, ship_year, CAST(rev AS DOUBLE) AS revenue,
       |CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
       |  / (COUNT(*) OVER (PARTITION BY p_brand)) AS avg_brand_revenue,
       |CAST(rev - LAG(rev) OVER (PARTITION BY p_brand ORDER BY ship_year) AS DOUBLE) AS yoy_delta,
       |CASE WHEN LAG(rev) OVER (PARTITION BY p_brand ORDER BY ship_year) IS NULL THEN 'n/a'
       |     WHEN rev > LAG(rev) OVER (PARTITION BY p_brand ORDER BY ship_year) THEN 'Increase'
       |     WHEN rev < LAG(rev) OVER (PARTITION BY p_brand ORDER BY ship_year) THEN 'Decrease'
       |     ELSE 'No Change' END AS trend
       |FROM b ORDER BY p_brand, ship_year""".stripMargin

  // q11 — segmentation: customers bucketed by account balance
  // (ref: 10_data_segmentation.sql; P5 CASE, P8 BETWEEN)
  private val q11: QFn = (s, dir) =>
    t(s, dir, "customer")
      .select(col("c_acctbal"),
        when(col("c_acctbal") < 0, "Delinquent")
          .when(col("c_acctbal").between(0, 5000), "Regular")
          .otherwise("Premium").as("segment"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
           dsum(col("c_acctbal")).cast("double").as("total_balance"))
      .orderBy("segment")

  private val q11Sql =
    s"""SELECT segment, COUNT(*) AS n_customers,
       |CAST(${dsumSql("c_acctbal")} AS DOUBLE) AS total_balance
       |FROM (SELECT c_acctbal,
       |  CASE WHEN c_acctbal < 0 THEN 'Delinquent'
       |       WHEN c_acctbal BETWEEN 0 AND 5000 THEN 'Regular'
       |       ELSE 'Premium' END AS segment FROM customer) s
       |GROUP BY segment ORDER BY segment""".stripMargin

  // q12 — part-to-whole: region revenue share via grand-total window
  // (ref: 11_part_to_whole_analysis.sql; W8, J2 chain)
  private val q12: QFn = (s, dir) => {
    val r = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(dsum(revenue).as("rev"))
    r.select(col("r_name"), col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") * lit(100.0)
          / sum(col("rev")).over(Window.partitionBy()).cast("double"))
          .as("revenue_pct"))
      .orderBy("r_name")
  }

  private val q12Sql =
    s"""WITH r AS (SELECT r_name, ${dsumSql(revenueSql)} AS rev
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  GROUP BY r_name)
       |SELECT r_name, CAST(rev AS DOUBLE) AS revenue,
       |CAST(rev AS DOUBLE) * 100.0 / CAST(SUM(rev) OVER () AS DOUBLE) AS revenue_pct
       |FROM r ORDER BY r_name""".stripMargin

  // q13 — customer report: per-customer KPIs, recency in boundary-counted
  // months, AOV with null guard, CASE segment, COALESCE for no-order
  // customers (ref: 12_report_customers.sql; composite of J1/J2, A2, P5-P8)
  private val q13: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val co = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"),
           dsum(col("o_totalprice")).as("spend"),
           max("o_orderdate").as("last_order"),
           min("o_orderdate").as("first_order"))
    val now = o.agg(max("o_orderdate").as("now_ts"))
    t(s, dir, "customer")
      .join(co, col("c_custkey") === col("o_custkey"), "left")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .crossJoin(now)
      .select(
        col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        coalesce(col("order_cnt"), lit(0L)).as("total_orders"),
        coalesce(col("spend").cast("double"), lit(0.0)).as("total_spend"),
        col("last_order"),
        monthsBetweenBoundary(col("last_order"), col("now_ts"))
          .cast("long").as("recency_months"),
        (col("spend").cast("double") / col("order_cnt")).as("avg_order_value"),
        when(col("spend").isNull, "New")
          .when(col("spend").cast("double") > 400000.0, "VIP")
          .when(col("order_cnt") >= 2, "Regular")
          .otherwise("New").as("segment"))
      .orderBy("c_custkey")
  }

  private val q13Sql =
    s"""WITH co AS (SELECT o_custkey, COUNT(*) AS order_cnt,
       |  ${dsumSql("o_totalprice")} AS spend,
       |  MAX(o_orderdate) AS last_order, MIN(o_orderdate) AS first_order
       |  FROM orders GROUP BY o_custkey),
       |now_t AS (SELECT MAX(o_orderdate) AS now_ts FROM orders)
       |SELECT c_custkey, c_name, n_name AS nation,
       |COALESCE(order_cnt, 0) AS total_orders,
       |COALESCE(CAST(spend AS DOUBLE), 0.0) AS total_spend,
       |last_order,
       |CAST((year(now_ts)*12 + month(now_ts))
       |   - (year(last_order)*12 + month(last_order)) AS BIGINT) AS recency_months,
       |CAST(spend AS DOUBLE) / order_cnt AS avg_order_value,
       |CASE WHEN spend IS NULL THEN 'New'
       |     WHEN CAST(spend AS DOUBLE) > 400000.0 THEN 'VIP'
       |     WHEN order_cnt >= 2 THEN 'Regular' ELSE 'New' END AS segment
       |FROM customer
       |LEFT JOIN co ON c_custkey = o_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |CROSS JOIN now_t
       |ORDER BY c_custkey""".stripMargin

  // q14 — product report: per-part KPIs, lifespan months, NULLIF-guarded
  // unit revenue, performance CASE (ref: 13_report_products.sql; A2, A7, P7)
  private val q14: QFn = (s, dir) => {
    val ps = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_orderkey")).as("order_cnt"),
           dsum(col("l_quantity")).as("qty"),
           dsum(revenue).as("rev"),
           max("l_shipdate").as("last_ship"),
           min("l_shipdate").as("first_ship"))
    t(s, dir, "part")
      .join(ps, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        coalesce(col("order_cnt"), lit(0L)).as("total_orders"),
        coalesce(col("qty").cast("double"), lit(0.0)).as("total_quantity"),
        coalesce(col("rev").cast("double"), lit(0.0)).as("total_revenue"),
        when(col("rev").isNull, "No Sales")
          .when(col("rev").cast("double") > 500000.0, "High Performer")
          .when(col("rev").cast("double") >= 100000.0, "Mid Range")
          .otherwise("Low Performer").as("performance"),
        monthsBetweenBoundary(col("first_ship"), col("last_ship"))
          .cast("long").as("lifespan_months"),
        (col("rev").cast("double")
          / nullif(col("qty").cast("double"), lit(0.0))).as("avg_unit_revenue"))
      .orderBy("p_partkey")
  }

  private val q14Sql =
    s"""WITH ps AS (SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS order_cnt,
       |  ${dsumSql("l_quantity")} AS qty, ${dsumSql(revenueSql)} AS rev,
       |  MAX(l_shipdate) AS last_ship, MIN(l_shipdate) AS first_ship
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT p_partkey, p_name, p_brand, p_type,
       |COALESCE(order_cnt, 0) AS total_orders,
       |COALESCE(CAST(qty AS DOUBLE), 0.0) AS total_quantity,
       |COALESCE(CAST(rev AS DOUBLE), 0.0) AS total_revenue,
       |CASE WHEN rev IS NULL THEN 'No Sales'
       |     WHEN CAST(rev AS DOUBLE) > 500000.0 THEN 'High Performer'
       |     WHEN CAST(rev AS DOUBLE) >= 100000.0 THEN 'Mid Range'
       |     ELSE 'Low Performer' END AS performance,
       |CAST((year(last_ship)*12 + month(last_ship))
       |   - (year(first_ship)*12 + month(first_ship)) AS BIGINT) AS lifespan_months,
       |CAST(rev AS DOUBLE) / NULLIF(CAST(qty AS DOUBLE), 0.0) AS avg_unit_revenue
       |FROM part LEFT JOIN ps ON p_partkey = l_partkey
       |ORDER BY p_partkey""".stripMargin

  // q15 — calendar-spine gap fill: generate every month between min and
  // max order date, left-join monthly revenue, fill gaps with zero — so
  // time series report no-activity periods instead of omitting them.
  private val q15: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val bounds = o.agg(
      date_trunc("month", min(col("o_orderdate"))).as("lo"),
      date_trunc("month", max(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
      expr("INTERVAL 1 MONTH"))).as("order_month"))
    val monthly = o.groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
    spine.join(monthly, Seq("order_month"), "left")
      .select(col("order_month"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("rev").cast("double"), lit(0.0)).as("revenue"))
      .orderBy("order_month")
  }
  private val q15Sql =
    s"""WITH bounds AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
       |  date_trunc('month', max(o_orderdate)) AS hi FROM orders),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS order_month
       |  FROM bounds),
       |monthly AS (SELECT date_trunc('month', o_orderdate) AS order_month,
       |  COUNT(*) AS n, ${dsumSql("o_totalprice")} AS rev
       |  FROM orders GROUP BY 1)
       |SELECT order_month, COALESCE(n, 0) AS n_orders,
       |COALESCE(CAST(rev AS DOUBLE), 0.0) AS revenue
       |FROM spine LEFT JOIN monthly USING (order_month)
       |ORDER BY order_month""".stripMargin

  // q16 — hierarchical subtotals via ROLLUP (region → nation → grand
  // total). Beyond the reference's surface (it stacks scalar aggs with
  // UNION ALL instead) but the idiomatic engine form of the same report.
  // NULLS FIRST pinned on both sides: Spark defaults nulls-first ASC,
  // DuckDB nulls-last.
  private val q16: QFn = (s, dir) => {
    // SQL entry path: sorting a rollup's grouping columns through the
    // Dataset API trips the ambiguous-self-join detector on rollup's
    // Expand node; the SQL analyzer resolves the same plan fine (and this
    // exercises the engine's spark.sql surface).
    graft.Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         |CAST(${dsumSql("c_acctbal")} AS DOUBLE) AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  private val q16Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
       |CAST(${dsumSql("c_acctbal")} AS DOUBLE) AS total_acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // q17 — pivot: nation × market-segment revenue matrix (explicit value
  // list so the schema is static and oracle-matchable; the reference
  // would hand-write one CASE-sum per segment).
  private val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val q17: QFn = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .pivot("c_mktsegment", segs)
      .agg(dsum(col("c_acctbal")).cast("double"))
      .na.fill(0.0, segs)
      .orderBy("n_name")
  private val q17Sql = {
    val cols = segs.map(g =>
      s"""COALESCE(CAST(SUM(CASE WHEN c_mktsegment = '$g'
         |  THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS "$g"""".stripMargin)
    s"""SELECT n_name, ${cols.mkString(",\n")}
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  // q18 — explicit ROWS frame: 3-month moving totals/averages (the
  // reference uses only default RANGE frames; W4/W5 extension).
  private val q18: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
    val w3 = Window.orderBy("order_month").rowsBetween(-2, 0)
    m.select(
        col("order_month"),
        col("rev").cast("double").as("monthly_revenue"),
        sum(col("rev")).over(w3).cast("double").as("mov3_revenue"),
        (sum(col("rev")).over(w3).cast("double")
          / sum(col("n")).over(w3)).as("mov3_avg_order_value"))
      .orderBy("order_month")
  }
  private val q18Sql =
    s"""WITH m AS (SELECT date_trunc('month', o_orderdate) AS order_month,
       |  ${dsumSql("o_totalprice")} AS rev, COUNT(*) AS n FROM orders GROUP BY 1)
       |SELECT order_month, CAST(rev AS DOUBLE) AS monthly_revenue,
       |CAST(SUM(rev) OVER (ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_revenue,
       |CAST(SUM(rev) OVER (ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       |  / SUM(n) OVER (ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov3_avg_order_value
       |FROM m ORDER BY order_month""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q15_monthly_gapfill" -> q15,
    "q16_rollup_subtotals" -> q16,
    "q17_pivot_segments" -> q17,
    "q18_moving_frame" -> q18,
    "q01_dimensions_exploration" -> q01,
    "q02_date_range" -> q02,
    "q03_measures_kpi" -> q03,
    "q04_magnitude_by_nation" -> q04,
    "q05_magnitude_by_part_type" -> q05,
    "q06_rank_top_parts" -> q06,
    "q07_top_customers_limit" -> q07,
    "q08_change_over_time" -> q08,
    "q09_cumulative_monthly" -> q09,
    "q10_yoy_brand_performance" -> q10,
    "q11_customer_segmentation" -> q11,
    "q12_part_to_whole_region" -> q12,
    "q13_report_customers" -> q13,
    "q14_report_products" -> q14)

  val oracleSql: Map[String, String] = Map(
    "q15_monthly_gapfill" -> q15Sql,
    "q16_rollup_subtotals" -> q16Sql,
    "q17_pivot_segments" -> q17Sql,
    "q18_moving_frame" -> q18Sql,
    "q01_dimensions_exploration" -> q01Sql,
    "q02_date_range" -> q02Sql,
    "q03_measures_kpi" -> q03Sql,
    "q04_magnitude_by_nation" -> q04Sql,
    "q05_magnitude_by_part_type" -> q05Sql,
    "q06_rank_top_parts" -> q06Sql,
    "q07_top_customers_limit" -> q07Sql,
    "q08_change_over_time" -> q08Sql,
    "q09_cumulative_monthly" -> q09Sql,
    "q10_yoy_brand_performance" -> q10Sql,
    "q11_customer_segmentation" -> q11Sql,
    "q12_part_to_whole_region" -> q12Sql,
    "q13_report_customers" -> q13Sql,
    "q14_report_products" -> q14Sql)
}
