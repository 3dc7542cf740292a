package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 thirteenth-session widening: the gradient-boosting split
  * kernel (histogram-based best-split search — the inner loop of
  * XGBoost/LightGBM tree growth, run as one bounded-histogram pass),
  * new-vs-returning revenue decomposition (the canonical growth
  * report), and Luby's maximal-independent-set rounds over the
  * co-purchase graph (the distributed symmetry-breaking primitive
  * behind conflict-free scheduling).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs, windows
  * only over domain-bounded state, total ORDER BYs.
  */
object Frontier9Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a37_gini_split — histogram-based best-split finding, the kernel a
  // distributed GBDT implementation runs per feature per node: ONE
  // data pass builds a bounded class histogram (price bucketed to
  // ≤100 cells), then every candidate threshold is scored from
  // cumulative counts — no per-row re-scan per candidate, which is
  // exactly why histogram GBDTs scale. Scoring: weighted Gini
  // impurity of the (left, right) partition induced by "price ≤ s";
  // each impurity is ONE rounded double from exact cumulative
  // integers; the argmax breaks ties on the smaller bucket. Output:
  // the best split with its gain over the parent impurity.
  // ------------------------------------------------------------------
  private val a37GiniSplit: QFn = (s, dir) => {
    val d = t(s, dir, "orders").select(
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("y"),
      least(floor(col("o_totalprice") / 5000.0).cast("long"), lit(99L))
        .as("b"))
    val hist = d.groupBy("b")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
    val wPre = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
    val cum = hist
      .withColumn("nl", sum(col("n")).over(wPre))
      .withColumn("nposl", sum(col("npos")).over(wPre))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("npost", sum(col("npos")).over(wAll))
    def gini(pos: org.apache.spark.sql.Column,
             tot: org.apache.spark.sql.Column) = {
      val p = pos.cast("double") / tot.cast("double")
      lit(1.0) - p * p - (lit(1.0) - p) * (lit(1.0) - p)
    }
    val cand = cum.filter(col("nl") > 0 && col("nl") < col("nt"))
      .withColumn("gini_parent_r",
        round(gini(col("npost"), col("nt")), 6))
      .withColumn("gini_split_r", round(
        (col("nl").cast("double") * gini(col("nposl"), col("nl")) +
          (col("nt") - col("nl")).cast("double") *
            gini(col("npost") - col("nposl"), col("nt") - col("nl"))) /
          col("nt").cast("double"), 6))
      .withColumn("gain_r",
        round(col("gini_parent_r") - col("gini_split_r"), 6))
    cand
      .withColumn("rn", row_number().over(
        Window.orderBy(col("gain_r").desc, col("b").asc)))
      .filter(col("rn") === 1)
      .select(((col("b") + 1) * 5000).cast("long").as("split_price"),
        col("nl").cast("long").as("n_left"),
        (col("nt") - col("nl")).cast("long").as("n_right"),
        col("gini_parent_r"), col("gini_split_r"), col("gain_r"))
  }
  private val a37GiniSplitSql =
    """WITH d AS (SELECT
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS y,
      |    least(CAST(floor(o_totalprice / 5000.0) AS BIGINT), 99) AS b
      |  FROM orders),
      |hist AS (SELECT b, COUNT(*) AS n, SUM(y) AS npos
      |  FROM d GROUP BY 1),
      |cum AS (SELECT b,
      |    SUM(n) OVER (ORDER BY b) AS nl,
      |    SUM(npos) OVER (ORDER BY b) AS nposl,
      |    SUM(n) OVER () AS nt, SUM(npos) OVER () AS npost
      |  FROM hist),
      |cand AS (SELECT b, nl, nt,
      |    round(1.0 - pow(CAST(npost AS DOUBLE) / CAST(nt AS DOUBLE), 2)
      |      - pow(1.0 - CAST(npost AS DOUBLE) / CAST(nt AS DOUBLE), 2), 6)
      |      AS gini_parent_r,
      |    round((CAST(nl AS DOUBLE)
      |        * (1.0 - pow(CAST(nposl AS DOUBLE) / CAST(nl AS DOUBLE), 2)
      |           - pow(1.0 - CAST(nposl AS DOUBLE) / CAST(nl AS DOUBLE), 2))
      |      + CAST(nt - nl AS DOUBLE)
      |        * (1.0 - pow(CAST(npost - nposl AS DOUBLE)
      |              / CAST(nt - nl AS DOUBLE), 2)
      |           - pow(1.0 - CAST(npost - nposl AS DOUBLE)
      |              / CAST(nt - nl AS DOUBLE), 2)))
      |      / CAST(nt AS DOUBLE), 6) AS gini_split_r
      |  FROM cum WHERE nl > 0 AND nl < nt)
      |SELECT CAST((b + 1) * 5000 AS BIGINT) AS split_price,
      |  CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
      |  gini_parent_r, gini_split_r,
      |  round(gini_parent_r - gini_split_r, 6) AS gain_r
      |FROM cand
      |QUALIFY row_number() OVER (
      |  ORDER BY round(gini_parent_r - gini_split_r, 6) DESC, b) = 1""".stripMargin

  // ------------------------------------------------------------------
  // q32_new_vs_returning — monthly revenue decomposed into first-time
  // vs repeat customers: the canonical growth report. One groupBy
  // finds each customer's first order month; one broadcast-free
  // customer-keyed join tags every order; one month groupBy rolls
  // up exact-decimal revenue and exact distinct-customer counts per
  // cohort side. Plan: two shuffles, both on natural keys.
  // ------------------------------------------------------------------
  private val q32NewVsReturning: QFn = (s, dir) => {
    val o = t(s, dir, "orders").select(col("o_custkey"),
      date_trunc("month", col("o_orderdate")).cast("date").as("m"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
    val firstM = o.groupBy("o_custkey").agg(min(col("m")).as("fm"))
    o.join(firstM, "o_custkey")
      .withColumn("is_new", col("m") === col("fm"))
      .groupBy("m")
      .agg(
        sum(when(col("is_new"), col("p")).otherwise(lit(0)
          .cast(DecimalType(12, 2)))).as("rev_new"),
        sum(when(!col("is_new"), col("p")).otherwise(lit(0)
          .cast(DecimalType(12, 2)))).as("rev_ret"),
        countDistinct(when(col("is_new"), col("o_custkey"))).as("n_new"),
        countDistinct(when(!col("is_new"), col("o_custkey"))).as("n_ret"))
      .select(col("m"),
        col("rev_new").cast("string").cast("double").as("rev_new_d"),
        col("rev_ret").cast("string").cast("double").as("rev_ret_d"),
        col("n_new"), col("n_ret"))
      .orderBy("m")
  }
  private val q32NewVsReturningSql =
    """WITH o AS (SELECT o_custkey,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS p
      |  FROM orders),
      |fm AS (SELECT o_custkey, min(m) AS fm FROM o GROUP BY 1)
      |SELECT o.m,
      |  CAST(CAST(SUM(CASE WHEN o.m = fm.fm THEN o.p
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
      |    AS rev_new_d,
      |  CAST(CAST(SUM(CASE WHEN o.m <> fm.fm THEN o.p
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
      |    AS rev_ret_d,
      |  COUNT(DISTINCT CASE WHEN o.m = fm.fm THEN o.o_custkey END) AS n_new,
      |  COUNT(DISTINCT CASE WHEN o.m <> fm.fm THEN o.o_custkey END) AS n_ret
      |FROM o JOIN fm USING (o_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // g_luby_mis — three rounds of Luby's maximal-independent-set
  // algorithm over the co-purchase graph: each round, an undecided
  // node joins the MIS iff its md5-derived priority beats every
  // undecided neighbor's (local-max symmetry breaking); MIS
  // neighbors drop out. Expected O(log n) rounds to termination —
  // three rounds here, with the undecided remainder reported, so the
  // oracle can replay rounds as chained CTEs. Each round is one
  // self-equi-join on the node key + a max-aggregate; per-round
  // lineage cuts keep plans flat (the CC/KCore discipline).
  // Priorities are exact BIGINTs — both engines break every tie
  // identically (and ids break priority ties).
  // ------------------------------------------------------------------
  private val gLubyMis: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    val e = e0.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint(true)
    // composite priority p·10⁶ + node is collision-free while node ids
    // stay below 10⁶ (true for every test SF; at larger id spaces widen
    // the multiplier — the DECIMAL carries it to 10³⁸)
    def prio(c: org.apache.spark.sql.Column) =
      (conv(substring(md5(concat(lit("mis:"), c.cast("string"))), 1, 13),
        16, 10).cast("long").cast(DecimalType(25, 0)) * 1000000 + c)
        .cast(DecimalType(25, 0))
    var und = e.select(col("src").as("node")).distinct()
      .withColumn("p", prio(col("node"))).localCheckpoint(true)
    var mis = und.filter(lit(false)).select(col("node"))
    (1 to 3).foreach { _ =>
      val eU = e
        .join(und.select(col("node").as("src")), "src")
        .join(und.select(col("node").as("dst"), col("p").as("pd")), "dst")
      val maxNb = eU.groupBy(col("src").as("node"))
        .agg(max(col("pd")).as("mx"))
      val winners = und.join(maxNb, Seq("node"), "left")
        .filter(col("mx").isNull || col("p") > col("mx"))
        .select(col("node"))
        .localCheckpoint(true)
      mis = mis.unionByName(winners).localCheckpoint(true)
      val killed = e.join(winners.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
      und = und
        .join(winners, Seq("node"), "left_anti")
        .join(killed, Seq("node"), "left_anti")
        .localCheckpoint(true)
    }
    val misAgg = mis.agg(count(lit(1)).as("n_mis"),
      coalesce(sum(col("node")), lit(0L)).cast("long").as("mis_checksum"))
    val undAgg = und.agg(count(lit(1)).as("n_undecided"))
    misAgg.crossJoin(broadcast(undAgg))
      .select(col("n_mis"), col("n_undecided"), col("mis_checksum"))
  }
  private val gLubyMisSql = {
    def round(r: Int, undPrev: String, misPrev: String) =
      s"""w$r AS MATERIALIZED (SELECT u.node FROM $undPrev u
         |  LEFT JOIN (SELECT e.src AS node, MAX(ud.p) AS mx
         |    FROM e JOIN $undPrev us ON us.node = e.src
         |    JOIN $undPrev ud ON ud.node = e.dst
         |    GROUP BY 1) m ON m.node = u.node
         |  WHERE m.mx IS NULL OR u.p > m.mx),
         |mis$r AS MATERIALIZED (SELECT node FROM $misPrev UNION ALL SELECT node FROM w$r),
         |k$r AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM e
         |        JOIN w$r ON w$r.node = e.src),
         |u$r AS MATERIALIZED (SELECT u.node, u.p FROM $undPrev u
         |  WHERE u.node NOT IN (SELECT node FROM w$r)
         |    AND u.node NOT IN (SELECT node FROM k$r))""".stripMargin
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |       FROM op a JOIN op b USING (l_orderkey)
       |       WHERE a.l_partkey < b.l_partkey
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0
       |      UNION ALL SELECT pb, pa FROM e0),
       |u0 AS MATERIALIZED (SELECT DISTINCT src AS node,
       |    CAST(CAST(('0x' || substring(md5('mis:' ||
       |      CAST(src AS VARCHAR)), 1, 13)) AS BIGINT) AS DECIMAL(25,0))
       |      * 1000000 + src AS p
       |  FROM e),
       |mis0 AS (SELECT node FROM u0 WHERE 1 = 0),
       |${round(1, "u0", "mis0")},
       |${round(2, "u1", "mis1")},
       |${round(3, "u2", "mis2")}
       |SELECT (SELECT COUNT(*) FROM mis3) AS n_mis,
       |  (SELECT COUNT(*) FROM u3) AS n_undecided,
       |  (SELECT CAST(COALESCE(SUM(node), 0) AS BIGINT) FROM mis3)
       |    AS mis_checksum""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "a37_gini_split" -> a37GiniSplit,
    "q32_new_vs_returning" -> q32NewVsReturning,
    "g_luby_mis" -> gLubyMis)

  val oracleSql: Map[String, String] = Map(
    "a37_gini_split" -> a37GiniSplitSql,
    "q32_new_vs_returning" -> q32NewVsReturningSql,
    "g_luby_mis" -> gLubyMisSql)
}
