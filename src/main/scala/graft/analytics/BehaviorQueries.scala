package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Behavioral / affinity analytics over the event stream and the order
  * baskets, plus the z-order layout operator — the round-5 widening of
  * the warehouse surface (funnel conversion, cohort retention, market-
  * basket lift, co-purchase graph triangles, multi-dimensional
  * clustering). Every entry follows the determinism rules (integer or
  * rational arithmetic only — counts, integer lags, single final
  * divisions — so doubles are bit-identical across engines) and ends in
  * a total ORDER BY.
  */
object BehaviorQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Event epoch-seconds: ns-long `ts` floored to seconds — the same
    * second-granularity both engines agree on (see ev_sessionization). */
  private val sec = expr("ts div 1000000000")

  // ev_funnel — ordered-stage funnel: first signup → first click within
  // 7 days of it → first purchase within 7 days of that click. Each
  // stage is one aggregate + one join hash-partitioned on user_id (Spark
  // reuses the partitioning across stages; no extra shuffle), the shape
  // that holds at any user cardinality. Latency totals are exact integer
  // sums of second lags.
  private val horizonS = 604800L // 7 days

  /** Ordered-stage funnel over (user_id, event_type, sec) rows: first
    * `stages.head`, then the first of each later stage within `horizonS`
    * seconds of reaching the previous one. One row per stage with the
    * surviving-user count and the exact integer sum of stage lags. */
  def funnelStages(e: DataFrame, stages: Seq[String], horizonS: Long): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    val first = e.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("sec")).as("prev"))
    def stageRow(df: DataFrame, n: Int, name: String, lag: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
             coalesce(sum(lag), lit(0L)).cast("long").as("total_lag_s"))
        .select(lit(n).as("stage"), lit(name).as("stage_name"),
                col("n_users"), col("total_lag_s"))
    val (rows, _) = stages.tail.zipWithIndex.foldLeft(
        (Seq(stageRow(first, 1, stages.head, lit(0L))), first)) {
      case ((acc, prev), (name, i)) =>
        val cur = e.filter(col("event_type") === name).join(prev, "user_id")
          .filter(col("sec") >= col("prev") && col("sec") < col("prev") + horizonS)
          .groupBy("user_id").agg(min(col("sec")).as("cur"), max(col("prev")).as("prev"))
        val row = stageRow(cur, i + 2, name, col("cur") - col("prev"))
        (acc :+ row, cur.select(col("user_id"), col("cur").as("prev")))
    }
    rows.reduce(_.unionByName(_)).orderBy("stage")
  }

  private val evFunnel: QFn = (s, dir) =>
    funnelStages(
      t(s, dir, "events").select(col("user_id"), col("event_type"), sec.as("sec")),
      Seq("signup", "click", "purchase"), horizonS)
  private val evFunnelSql =
    s"""WITH e AS (SELECT user_id, event_type,
       |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       |s1 AS (SELECT user_id, min(sec) AS ss FROM e
       |       WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (SELECT e.user_id, min(sec) AS cs, max(ss) AS ss
       |       FROM e JOIN s1 USING (user_id)
       |       WHERE event_type = 'click' AND sec >= ss AND sec < ss + $horizonS
       |       GROUP BY 1),
       |s3 AS (SELECT e.user_id, min(sec) AS ps, max(cs) AS cs
       |       FROM e JOIN s2 USING (user_id)
       |       WHERE event_type = 'purchase' AND sec >= cs AND sec < cs + $horizonS
       |       GROUP BY 1)
       |SELECT stage, stage_name, n_users, total_lag_s FROM (
       |  SELECT 1 AS stage, 'signup' AS stage_name, COUNT(*) AS n_users,
       |         CAST(0 AS BIGINT) AS total_lag_s FROM s1
       |  UNION ALL
       |  SELECT 2, 'click', COUNT(*), CAST(COALESCE(SUM(cs - ss), 0) AS BIGINT) FROM s2
       |  UNION ALL
       |  SELECT 3, 'purchase', COUNT(*), CAST(COALESCE(SUM(ps - cs), 0) AS BIGINT) FROM s3)
       |ORDER BY stage""".stripMargin

  // ev_retention — day-grain cohort retention: cohort = day of a user's
  // first signup; a cell counts users from that cohort active (any
  // event) day_offset days later. One distinct + one join + one groupBy,
  // all partitioned on user_id / (cohort, offset) — the triangular
  // cohort matrix every growth dashboard is built from.
  /** Cohort retention matrix over (user_id, event_type, day) rows:
    * cohort = day of first `cohortType` event; each cell counts that
    * cohort's users active (any event) `day_offset` days later. */
  def retentionMatrix(e: DataFrame, cohortType: String): DataFrame = {
    val coh = e.filter(col("event_type") === cohortType)
      .groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val act = e.select(col("user_id"), col("day")).distinct()
    act.join(coh, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  private val evRetention: QFn = (s, dir) =>
    retentionMatrix(
      t(s, dir, "events").select(col("user_id"), col("event_type"),
        expr("(ts div 1000000000) div 86400").as("day")),
      cohortType = "signup")
  private val evRetentionSql =
    """WITH e AS (SELECT user_id, event_type,
      |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |coh AS (SELECT user_id, min(day) AS cohort_day FROM e
      |        WHERE event_type = 'signup' GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, day FROM e)
      |SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_active
      |FROM act JOIN coh USING (user_id)
      |WHERE day >= cohort_day
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q19 — market-basket affinity: parts co-purchased in the same order,
  // with support / confidence / lift from exact co-occurrence counts.
  // The pair join is keyed on l_orderkey (pairs-per-order is quadratic
  // in basket size, bounded by the ~20-line basket cap of order data);
  // part-frequency joins broadcast (part cardinality ≪ pair count). All
  // measures are single divisions of exact integer-valued doubles —
  // bit-identical across engines, no decimal routing needed.
  /** Market-basket pair affinity over (basket, item) rows (need not be
    * pre-distinct): co-occurrence count, support, confidence and lift
    * for every item pair sharing ≥ `minBoth` baskets. */
  def basketAffinity(df: DataFrame, basketCol: String, itemCol: String,
                     minBoth: Long): DataFrame = {
    val op = df.select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct()
    val nBaskets = op.select(countDistinct(col("bk")).as("n_orders"))
    val cnt = op.groupBy("it").agg(count(lit(1)).as("n_ord"))
    val a = op.select(col("bk"), col("it").as("part_a"))
    val b = op.select(col("bk"), col("it").as("part_b"))
    val co = a.join(b, "bk").filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minBoth)
    co.join(cnt.select(col("it").as("part_a"), col("n_ord").as("n_a")), "part_a")
      .join(cnt.select(col("it").as("part_b"), col("n_ord").as("n_b")), "part_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("n_both"),
        (col("n_both").cast("double") / col("n_orders").cast("double")).as("support"),
        (col("n_both").cast("double") / col("n_a").cast("double")).as("confidence_a"),
        ((col("n_both").cast("double") * col("n_orders").cast("double"))
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy("part_a", "part_b")
  }

  private val q19Basket: QFn = (s, dir) =>
    basketAffinity(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minBoth = 2L)
  private val q19Sql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
      |cnt AS (SELECT l_partkey, COUNT(*) AS n_ord FROM op GROUP BY 1),
      |co AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
      |       FROM op a JOIN op b USING (l_orderkey)
      |       WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT part_a, part_b, n_both,
      |CAST(n_both AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
      |CAST(n_both AS DOUBLE) / CAST(ca.n_ord AS DOUBLE) AS confidence_a,
      |(CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE))
      |  / (CAST(ca.n_ord AS DOUBLE) * CAST(cb.n_ord AS DOUBLE)) AS lift
      |FROM co JOIN cnt ca ON ca.l_partkey = part_a
      |        JOIN cnt cb ON cb.l_partkey = part_b
      |        CROSS JOIN tot
      |ORDER BY part_a, part_b""".stripMargin

  // g_triangle_count — triangles in the co-purchase graph (edges = part
  // pairs co-occurring in ≥2 orders), via the degree-ordered orientation
  // (each edge directed low→high (degree, id)): every triangle is
  // counted exactly once, and wedge enumeration is bounded by the
  // orientation's out-degree (O(m^1.5) total — the MapReduce triangle-
  // counting shape of Suri & Vassilvitskii, WWW'11), not by hub degrees.
  private val gTriangles: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val edges = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
      .select(col("pa").as("ea"), col("pb").as("eb"))
    graft.operators.Triangles.stats(edges, "ea", "eb")
  }
  private val gTrianglesSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS ea, b.l_partkey AS eb
      |      FROM op a JOIN op b USING (l_orderkey)
      |      WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT node, COUNT(*) AS d FROM
      |        (SELECT ea AS node FROM e UNION ALL SELECT eb FROM e) GROUP BY 1),
      |o AS (SELECT CASE WHEN (da.d, e.ea) < (db.d, e.eb) THEN e.ea ELSE e.eb END AS s,
      |             CASE WHEN (da.d, e.ea) < (db.d, e.eb) THEN e.eb ELSE e.ea END AS t,
      |             CASE WHEN (da.d, e.ea) < (db.d, e.eb) THEN db.d ELSE da.d END AS dt
      |      FROM e JOIN deg da ON da.node = e.ea JOIN deg db ON db.node = e.eb),
      |tri AS (SELECT COUNT(*) AS n_triangles
      |        FROM o x JOIN o y ON x.s = y.s
      |          AND ((x.dt, x.t) < (y.dt, y.t))
      |        JOIN o z ON z.s = x.t AND z.t = y.t)
      |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
      |       (SELECT COUNT(*) FROM e) AS n_edges,
      |       (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin

  // g_pagerank — damped PageRank (3 fixed rounds) over the symmetrized
  // co-purchase graph: per-round join + decimal-routed aggregation, both
  // hash-partitioned on the node key (operators/PageRank.scala). The
  // oracle unrolls all three rounds in SQL with the same decimal-routed
  // sums, so every intermediate rank is engine-identical; the VARCHAR
  // route on the decimal→double surface matches Spark's correctly-
  // rounded BigDecimal.doubleValue.
  private val gPageRank: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    val edges = e0.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst")))
    // edges are symmetrized two lines up -> no sinks by construction;
    // skip the audit job
    graft.operators.PageRank.ranks(edges, "src", "dst",
        iterations = 3, damping = 0.85, validateSinks = false)
      .orderBy("node")
  }
  private val gPageRankSql = {
    def iter(prev: String, cur: String) =
      s"""$cur AS (SELECT nodes.node,
         |  ((1.0 - 0.85) / CAST(nn.n AS DOUBLE))
         |    + 0.85 * COALESCE(CAST(CAST(c.s AS VARCHAR) AS DOUBLE), 0.0) AS rank
         |  FROM nodes CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS node,
         |      SUM(CAST($prev.rank / out_d.out_deg AS DECIMAL(38,15))) AS s
         |    FROM e JOIN $prev ON $prev.node = e.src
         |           JOIN out_d ON out_d.src = e.src GROUP BY 1) c
         |    ON c.node = nodes.node)""".stripMargin
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |       FROM op a JOIN op b USING (l_orderkey)
       |       WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS (SELECT pa AS src, pb AS dst FROM e0
       |      UNION ALL SELECT pb, pa FROM e0),
       |out_d AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / CAST(nn.n AS DOUBLE) AS rank
       |       FROM nodes CROSS JOIN nn),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, round(rank, 9) AS rank_r FROM r3 ORDER BY node""".stripMargin
  }

  // g_two_hop_recs — "bought with what you bought": 2-hop neighbors in
  // the co-purchase graph, path-counted and top-3-ranked per source,
  // direct neighbors excluded. Hub degrees make raw wedge enumeration
  // quadratic, so each node keeps only its 30 strongest edges first
  // (key-partitioned window — the candidate-generation cap every
  // production recommender applies); after the cap the wedge join is
  // bounded by 30² per node at ANY graph size. Every stage is keyed on
  // a node id — no global window, no driver state.
  private val gTwoHopRecs: QFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    val edges = e0.select(col("pa").as("src"), col("pb").as("dst"), col("n_both"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst"), col("n_both")))
    val byStrength = Window.partitionBy("src")
      .orderBy(col("n_both").desc, col("dst"))
    val capped = edges.withColumn("__rn", row_number().over(byStrength))
      .filter(col("__rn") <= 30).drop("__rn")
    val x = capped.select(col("src"), col("dst").as("mid"))
    val y = capped.select(col("src").as("mid"), col("dst").as("rec"))
    val paths = x.join(y, "mid")
      .filter(col("src") =!= col("rec"))
      .groupBy("src", "rec").agg(count(lit(1)).as("n_paths"))
    val indirect = paths.join(
      edges.select(col("src"), col("dst").as("rec")),
      Seq("src", "rec"), "left_anti")
    val byPaths = Window.partitionBy("src")
      .orderBy(col("n_paths").desc, col("rec"))
    indirect.withColumn("rank", row_number().over(byPaths))
      .filter(col("rank") <= 3)
      .select(col("src"), col("rec"), col("n_paths"), col("rank"))
      .orderBy("src", "rank")
  }
  private val gTwoHopRecsSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_both
      |       FROM op a JOIN op b USING (l_orderkey)
      |       WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa AS src, pb AS dst, n_both FROM e0
      |      UNION ALL SELECT pb, pa, n_both FROM e0),
      |capped AS (SELECT src, dst FROM e
      |  QUALIFY row_number() OVER (PARTITION BY src
      |    ORDER BY n_both DESC, dst) <= 30),
      |paths AS (SELECT x.src, y.dst AS rec, COUNT(*) AS n_paths
      |  FROM capped x JOIN capped y ON x.dst = y.src
      |  WHERE x.src <> y.dst GROUP BY 1, 2),
      |indirect AS (SELECT p.* FROM paths p
      |  WHERE NOT EXISTS (SELECT 1 FROM e
      |    WHERE e.src = p.src AND e.dst = p.rec))
      |SELECT src, rec, n_paths,
      |CAST(row_number() OVER (PARTITION BY src
      |  ORDER BY n_paths DESC, rec) AS INT) AS rank
      |FROM indirect
      |QUALIFY rank <= 3
      |ORDER BY src, rank""".stripMargin

  // s10 — z-order layout: Morton-interleave (o_custkey, order-day) and
  // report per-z-range stats. Tight min/max spans on BOTH dimensions in
  // every z-bucket are exactly what parquet row-group pruning consumes
  // after ZOrder.writeZOrdered — a filter on either customer OR date
  // skips most buckets, which a single-column sort only gives for its
  // leading column. (ZOrderSpec proves the written-layout side; this
  // entry driver-proves the interleave arithmetic + clustering stats.)
  private val s10ZOrder: QFn = (s, dir) => {
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1995-01-01").cast("date")).cast("long")
    val z = graft.operators.ZOrder.interleave16(col("o_custkey"), day)
    t(s, dir, "orders")
      .select(col("o_custkey"), day.as("day"), z.as("z"))
      .groupBy(shiftrightunsigned(col("z"), 16).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
           min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("z_bucket")
  }
  private def spreadSql(x: String): String = {
    val a = s"($x & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }
  private val s10Sql = {
    val day = "date_diff('day', DATE '1995-01-01', o_orderdate)"
    val z = s"(${spreadSql("o_custkey")} | (${spreadSql(day)} << 1))"
    s"""WITH o AS (SELECT o_custkey, $day AS day, $z AS z FROM orders)
       |SELECT z // 65536 AS z_bucket, COUNT(*) AS n_rows,
       |MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
       |MIN(day) AS min_day, MAX(day) AS max_day
       |FROM o GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // q20 — RFM segmentation: per-customer recency (days before the
  // corpus max order date), frequency (order count) and monetary
  // (decimal-routed revenue), bucketed by fixed business thresholds into
  // 1-5 scores and rolled up per segment. Fixed thresholds (not global
  // ntile) keep the plan free of single-partition windows — the
  // 100×-safe form of the classic RFM report.
  private def dsum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 4)))
  private val q20Rfm: QFn = (s, dir) => {
    val orders = t(s, dir, "orders")
    val maxD = orders.agg(max(col("o_orderdate")).as("max_d"))
    val cust = orders.groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_d"),
           count(lit(1)).as("freq"),
           dsum(col("o_totalprice")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxD))
      .withColumn("recency",
        datediff(col("max_d").cast("date"), col("last_d").cast("date")))
    val scored = cust.select(
      when(col("recency") <= 90, 5).when(col("recency") <= 365, 4)
        .when(col("recency") <= 730, 3).when(col("recency") <= 1095, 2)
        .otherwise(1).as("r_score"),
      when(col("freq") >= 20, 5).when(col("freq") >= 15, 4)
        .when(col("freq") >= 10, 3).when(col("freq") >= 5, 2)
        .otherwise(1).as("f_score"),
      when(col("monetary") >= 2000000.0, 5).when(col("monetary") >= 1500000.0, 4)
        .when(col("monetary") >= 1000000.0, 3).when(col("monetary") >= 500000.0, 2)
        .otherwise(1).as("m_score"),
      col("monetary"))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
           sum(col("monetary").cast(org.apache.spark.sql.types.DecimalType(19, 4)))
             .cast("double").as("segment_value"))
      .orderBy("r_score", "f_score", "m_score")
  }
  private val q20Sql =
    """WITH maxd AS (SELECT max(o_orderdate) AS max_d FROM orders),
      |cust AS (SELECT o_custkey, max(o_orderdate) AS last_d,
      |  COUNT(*) AS freq,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1),
      |scored AS (SELECT
      |  CASE WHEN date_diff('day', last_d, max_d) <= 90 THEN 5
      |       WHEN date_diff('day', last_d, max_d) <= 365 THEN 4
      |       WHEN date_diff('day', last_d, max_d) <= 730 THEN 3
      |       WHEN date_diff('day', last_d, max_d) <= 1095 THEN 2
      |       ELSE 1 END AS r_score,
      |  CASE WHEN freq >= 20 THEN 5 WHEN freq >= 15 THEN 4
      |       WHEN freq >= 10 THEN 3 WHEN freq >= 5 THEN 2
      |       ELSE 1 END AS f_score,
      |  CASE WHEN monetary >= 2000000.0 THEN 5 WHEN monetary >= 1500000.0 THEN 4
      |       WHEN monetary >= 1000000.0 THEN 3 WHEN monetary >= 500000.0 THEN 2
      |       ELSE 1 END AS m_score,
      |  monetary
      |  FROM cust CROSS JOIN maxd)
      |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
      |CAST(SUM(CAST(monetary AS DECIMAL(19,4))) AS DOUBLE) AS segment_value
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // s11 — calendar dimension generation: the date-spine every warehouse
  // builds first. One sequence() explode over the fact's date bounds —
  // no source table, no driver loop; attributes are pure date
  // arithmetic (ISO day-of-week so both engines agree on week start).
  private val s11DateDim: QFn = (s, dir) => {
    val bounds = t(s, dir, "orders")
      .agg(min(col("o_orderdate").cast("date")).as("d0"),
           max(col("o_orderdate").cast("date")).as("d1"))
    bounds.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .select(col("d"),
        year(col("d")).as("year"),
        quarter(col("d")).as("quarter"),
        month(col("d")).as("month"),
        dayofmonth(col("d")).as("day_of_month"),
        (expr("weekday(d)") + 1).as("iso_dow"),
        (expr("weekday(d)") + 1 >= 6).as("is_weekend"),
        datediff(last_day(col("d")), col("d")).as("days_to_month_end"))
      .orderBy("d")
  }
  private val s11Sql =
    """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
      |                  max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
      |d AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      |      FROM b)
      |SELECT d, CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
      |CAST(month(d) AS INT) AS month, CAST(day(d) AS INT) AS day_of_month,
      |CAST(isodow(d) AS INT) AS iso_dow, isodow(d) >= 6 AS is_weekend,
      |CAST(date_diff('day', d, last_day(d)) AS INT) AS days_to_month_end
      |FROM d ORDER BY d""".stripMargin

  // ev_anomaly_days — per-user activity anomalies: a user's daily event
  // counts are z-scored against that user's own mean/stddev (sample), and
  // days ≥ 2σ above surface. Moments are exact integer window sums over
  // the user_id partition (no global window, no second shuffle past the
  // daily groupBy — the window reuses its hash partitioning), and the
  // z expression is one fixed double tree over exact integers, so the
  // ≥ 2.0 cut lands identically in both engines.
  /** Daily-count anomaly days over (user_id, day) event rows: days whose
    * count is ≥ `sigmas` sample standard deviations above the user's own
    * daily mean (users need ≥ 2 active days and nonzero variance). */
  def anomalyDays(e: DataFrame, sigmas: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = e.groupBy("user_id", "day").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("user_id")
    val withM = daily
      .withColumn("nd", count(lit(1)).over(w))
      .withColumn("sx", sum(col("n_events")).over(w))
      .withColumn("sxx", sum(col("n_events") * col("n_events")).over(w))
    val nd = col("nd").cast("double")
    val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
    val mean = sx / nd
    val varS = (sxx - sx * sx / nd) / (nd - lit(1.0))
    val z = (col("n_events").cast("double") - mean) / sqrt(varS)
    withM.filter(col("nd") > 1 && varS > 0.0 && z >= sigmas)
      .select(col("user_id"), col("day"), col("n_events"),
        round(z, 6).as("z_r"))
      .orderBy("user_id", "day")
  }

  private val evAnomaly: QFn = (s, dir) =>
    anomalyDays(
      t(s, dir, "events").select(col("user_id"),
        expr("(ts div 1000000000) div 86400").as("day")),
      sigmas = 2.0)
  private val evAnomalySql =
    """WITH e AS (SELECT user_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |daily AS (SELECT user_id, day, COUNT(*) AS n_events FROM e GROUP BY 1, 2),
      |m AS (SELECT user_id, day, n_events,
      |  CAST(COUNT(*) OVER w AS DOUBLE) AS nd,
      |  CAST(SUM(n_events) OVER w AS DOUBLE) AS sx,
      |  CAST(SUM(n_events * n_events) OVER w AS DOUBLE) AS sxx
      |  FROM daily WINDOW w AS (PARTITION BY user_id))
      |SELECT user_id, day, n_events,
      |round((CAST(n_events AS DOUBLE) - sx / nd)
      |  / sqrt((sxx - sx * sx / nd) / (nd - 1.0)), 6) AS z_r
      |FROM m
      |WHERE nd > 1 AND (sxx - sx * sx / nd) / (nd - 1.0) > 0.0
      |  AND (CAST(n_events AS DOUBLE) - sx / nd)
      |    / sqrt((sxx - sx * sx / nd) / (nd - 1.0)) >= 2.0
      |ORDER BY user_id, day""".stripMargin

  // q21 — Pareto / ABC analysis: parts ranked by revenue with their
  // cumulative revenue share; A = the parts covering the first 80% of
  // revenue, B to 95%, C the tail. The running sum is the classic
  // unpartitioned-window trap — here it goes through
  // operators/PrefixSum (range-partition + per-partition window +
  // broadcast prefix offsets), so no single task ever sees the whole
  // ranking. Sums are decimal-exact end to end; the share is one double
  // division of VARCHAR-routable exact scalars.
  private val q21Pareto: QFn = (s, dir) => {
    val rev = t(s, dir, "lineitem").groupBy("l_partkey")
      .agg(dsum(col("l_extendedprice")).as("rev"))
    val tot = rev.agg(sum(col("rev")).as("tot"))
    val cum = graft.operators.PrefixSum.withRunningSum(
      rev, Seq(col("rev").desc, col("l_partkey")), col("rev"), "cum_rev")
    val share = col("cum_rev").cast("double") / col("tot").cast("double")
    cum.crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("rev").cast("double").as("rev"),
        share.as("cum_share"),
        when(share <= 0.80, "A").when(share <= 0.95, "B")
          .otherwise("C").as("abc_class"))
      .orderBy("l_partkey")
  }
  private val q21Sql =
    """WITH r AS (SELECT l_partkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      |  FROM lineitem GROUP BY 1),
      |c AS (SELECT l_partkey, rev,
      |  SUM(rev) OVER (ORDER BY rev DESC, l_partkey ROWS UNBOUNDED PRECEDING) AS cum,
      |  SUM(rev) OVER () AS tot FROM r),
      |d AS (SELECT l_partkey,
      |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev,
      |  CAST(CAST(cum AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS cum_share FROM c)
      |SELECT l_partkey, rev, cum_share,
      |CASE WHEN cum_share <= 0.80 THEN 'A'
      |     WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class
      |FROM d ORDER BY l_partkey""".stripMargin

  // ev_attribution — last-touch marketing attribution: every purchase is
  // credited to the user's most recent click no older than 7 days
  // (as-of join semantics — operators/AsOfJoin's union-and-sweep form,
  // ONE shuffle on user_id, no per-row inequality join), then revenue
  // rolls up by attribution day; purchases with no qualifying click land
  // in the day = -1 bucket. DuckDB's native ASOF JOIN is the oracle —
  // its greatest-right-ts-≤-left-ts pick is exactly asOf's inclusive
  // semantics (no same-µs click ties exist in the data at any SF; the
  // day-grain rollup would absorb them regardless).
  private val evAttribution: QFn = (s, dir) => {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("us"),
              col("value").cast(DecimalType(18, 4)).as("pvalue"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("us"),
              expr("ts div 1000").as("click_us"))
    val horizonUs = 7L * 86400L * 1000000L
    graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "us")
      .withColumn("attr_day",
        when(col("click_us").isNotNull &&
             col("us") - col("click_us") <= horizonUs,
             (col("click_us") / lit(86400000000L)).cast("long"))
          .otherwise(lit(-1L)))
      .groupBy("attr_day")
      .agg(count(lit(1)).as("n_purchases"),
           sum(col("pvalue")).cast("double").as("attributed_value"))
      .orderBy("attr_day")
  }
  private val evAttributionSql =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS us,
      |  CAST(value AS DECIMAL(18,4)) AS pvalue
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id AS cu, epoch_us(ts) AS click_us
      |  FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.us, p.pvalue, c.click_us
      |  FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.us >= c.click_us),
      |a AS (SELECT CASE WHEN click_us IS NOT NULL
      |    AND us - click_us <= 604800000000 THEN click_us // 86400000000
      |  ELSE -1 END AS attr_day, pvalue FROM j)
      |SELECT CAST(attr_day AS BIGINT) AS attr_day,
      |COUNT(*) AS n_purchases,
      |CAST(SUM(pvalue) AS DOUBLE) AS attributed_value
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ev_attribution" -> evAttribution,
    "s11_date_dim" -> s11DateDim,
    "ev_anomaly_days" -> evAnomaly,
    "q21_pareto_abc" -> q21Pareto,
    "ev_funnel" -> evFunnel,
    "ev_retention" -> evRetention,
    "q19_basket_affinity" -> q19Basket,
    "q20_rfm_segmentation" -> q20Rfm,
    "g_triangle_count" -> gTriangles,
    "g_pagerank" -> gPageRank,
    "g_two_hop_recs" -> gTwoHopRecs,
    "s10_zorder_layout" -> s10ZOrder)

  val oracleSql: Map[String, String] = Map(
    "ev_attribution" -> evAttributionSql,
    "s11_date_dim" -> s11Sql,
    "ev_anomaly_days" -> evAnomalySql,
    "q21_pareto_abc" -> q21Sql,
    "ev_funnel" -> evFunnelSql,
    "ev_retention" -> evRetentionSql,
    "q19_basket_affinity" -> q19Sql,
    "q20_rfm_segmentation" -> q20Sql,
    "g_triangle_count" -> gTrianglesSql,
    "g_pagerank" -> gPageRankSql,
    "g_two_hop_recs" -> gTwoHopRecsSql,
    "s10_zorder_layout" -> s10Sql)
}
