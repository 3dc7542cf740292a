package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, eighteenth pack: experiment power analysis (the
  * sample-size sizing every A/B platform answers before launch —
  * closes the experimentation toolkit next to the SRM and
  * randomization-test entries), a data-retention policy sweep (rows
  * and bytes eligible for deletion under per-segment retention
  * clocks — the governance plan a DPO signs off), and the churn
  * anti-join (orders with NO follow-up within the window — the
  * temporal NOT EXISTS that feeds churn models).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier30Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a51_power_analysis — two-sample sizing at 80% power / 5% α
  // (normal approximation: n per arm = (z_{α/2}+z_β)²·2σ²/δ² ≈
  // 15.698·σ²/δ²) for detecting a 2% lift in mean order price, per
  // market segment: σ² from exact decimal sufficient statistics
  // (n, Σx, Σx²), δ = 0.02·mean, both ONE rounded double each. Also
  // reports the detectable effect at the CURRENT sample size (the
  // inverse question — "what lift could this month's traffic even
  // see?"). One aggregation per segment; the z-constants are
  // literals, so both engines evaluate the identical closed form.
  // ------------------------------------------------------------------
  private val a51PowerAnalysis: QFn = (s, dir) => {
    val st = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).as("sx"),
        sum((col("o_totalprice").cast(DecimalType(18, 4)) *
          col("o_totalprice").cast(DecimalType(18, 4)))
          .cast(DecimalType(38, 8))).as("sxx"))
    val n = col("n").cast("double")
    val mean = col("sx").cast("double") / n
    val variance = (col("sxx").cast("double") - mean * mean * n) / (n - 1)
    // (1.959964 + 0.841621)^2 * 2 = 15.697674
    val kappa = lit(15.697674)
    st.select(col("c_mktsegment"), col("n"),
        round(mean, 4).as("mean_r"),
        round(sqrt(variance), 4).as("sd_r"),
        round(kappa * variance / ((mean * 0.02) * (mean * 0.02)), 2)
          .as("n_per_arm_for_2pct_r"),
        // detectable relative effect with current n split into 2 arms:
        // delta = sqrt(kappa * variance / (n/2)) / mean
        round(sqrt(kappa * variance / (n / 2)) / mean, 6)
          .as("mde_at_current_n_r"))
      .orderBy("c_mktsegment")
  }
  private val a51PowerAnalysisSql =
    """WITH st AS (SELECT c_mktsegment, COUNT(*) AS n,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sx,
      |    SUM(CAST(CAST(o_totalprice AS DECIMAL(28,4))
      |      * CAST(o_totalprice AS DECIMAL(18,4)) AS DECIMAL(38,8)))
      |      AS sxx
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |d AS (SELECT c_mktsegment, n, CAST(n AS DOUBLE) AS nd,
      |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
      |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd
      |  FROM st)
      |SELECT c_mktsegment, n,
      |  round(sxd / nd, 4) AS mean_r,
      |  round(sqrt((sxxd - (sxd / nd) * (sxd / nd) * nd) / (nd - 1)), 4)
      |    AS sd_r,
      |  round(15.697674 * ((sxxd - (sxd / nd) * (sxd / nd) * nd)
      |      / (nd - 1))
      |    / (((sxd / nd) * 0.02) * ((sxd / nd) * 0.02)), 2)
      |    AS n_per_arm_for_2pct_r,
      |  round(sqrt(15.697674 * ((sxxd - (sxd / nd) * (sxd / nd) * nd)
      |      / (nd - 1)) / (nd / 2)) / (sxd / nd), 6)
      |    AS mde_at_current_n_r
      |FROM d ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // x13_retention_sweep — retention-policy deletion plan: each
  // market segment carries a policy clock (a literal policy map —
  // 3/4/5/6/7 years), the "now" anchor is the corpus max order date
  // (deterministic — no wall clock in the plan), and the sweep
  // reports rows and revenue-bytes eligible for purge per segment
  // plus the earliest surviving date. The eligibility predicate is a
  // pure comparison against the broadcast policy row — the scan
  // stays one pass, and at 100 TB the same predicate drives
  // partition-level deletes (months entirely past the clock drop by
  // manifest, no row scan).
  // ------------------------------------------------------------------
  private val x13RetentionSweep: QFn = (s, dir) => {
    val policy = Seq(("AUTOMOBILE", 3), ("BUILDING", 4), ("FURNITURE", 5),
      ("HOUSEHOLD", 6), ("MACHINERY", 7))
    val pol = policy.map(p => s"WHEN '${p._1}' THEN ${p._2}")
      .mkString("CASE c_mktsegment ", " ", " ELSE 10 END")
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), to_date(col("o_orderdate")).as("d"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("tp"))
    val anchor = o.agg(max(col("d")).as("now"))
    o.crossJoin(broadcast(anchor))
      .withColumn("keep_years", expr(pol))
      .withColumn("eligible",
        col("d") < add_months(col("now"), lit(-12) * col("keep_years")))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("eligible"), 1L).otherwise(0L)).cast("long")
          .as("n_purgeable"),
        sum(when(col("eligible"), col("tp"))).cast("string")
          .as("purgeable_revenue"),
        min(when(!col("eligible"), col("d"))).cast("string")
          .as("earliest_kept"))
      .select(col("c_mktsegment"), col("n_rows"), col("n_purgeable"),
        coalesce(col("purgeable_revenue"), lit("0.0000"))
          .as("purgeable_revenue"),
        col("earliest_kept"),
        round(col("n_purgeable").cast("double") /
          col("n_rows").cast("double"), 6).as("purge_rate_r"))
      .orderBy("c_mktsegment")
  }
  private val x13RetentionSweepSql =
    """WITH o AS (SELECT c_mktsegment, CAST(o_orderdate AS DATE) AS d,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS tp
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |a AS (SELECT MAX(d) AS now FROM o),
      |e AS (SELECT o.*, CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 3
      |    WHEN 'BUILDING' THEN 4 WHEN 'FURNITURE' THEN 5
      |    WHEN 'HOUSEHOLD' THEN 6 WHEN 'MACHINERY' THEN 7
      |    ELSE 10 END AS keep_years,
      |    a.now FROM o CROSS JOIN a),
      |f AS (SELECT c_mktsegment, d, tp,
      |    d < now - to_months(CAST(12 * keep_years AS INT)) AS eligible
      |  FROM e)
      |SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN eligible THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purgeable,
      |  COALESCE(CAST(SUM(CASE WHEN eligible THEN tp END) AS VARCHAR),
      |    '0.0000') AS purgeable_revenue,
      |  CAST(MIN(CASE WHEN NOT eligible THEN d END) AS VARCHAR)
      |    AS earliest_kept,
      |  round(CAST(SUM(CASE WHEN eligible THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS purge_rate_r
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // j29_churn_anti_join — temporal NOT EXISTS: an order is a "churn
  // point" when the same customer places NO further order within 90
  // days (and it isn't the dangling end of the observation window —
  // orders within 90 days of the corpus edge are censored out, the
  // survival-analysis discipline ev_survival_km already applies).
  // One lead() per customer partition answers the NOT EXISTS without
  // any join at all — the plan every temporal anti-join should
  // compile to. Reported monthly with churn rate among measurable
  // orders.
  // ------------------------------------------------------------------
  private val j29ChurnAntiJoin: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
    val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    val anchor = o.agg(max(col("d")).as("edge"))
    val marked = o
      .withColumn("nxt", lead(col("d"), 1).over(w))
      .crossJoin(broadcast(anchor))
      .withColumn("censored", datediff(col("edge"), col("d")) < 90)
      .withColumn("churn",
        !col("censored") &&
        (col("nxt").isNull || datediff(col("nxt"), col("d")) > 90))
    marked
      .groupBy((year(col("d")) * 12 + month(col("d"))).cast("long")
        .as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("censored"), 1L).otherwise(0L)).cast("long")
          .as("n_censored"),
        sum(when(col("churn"), 1L).otherwise(0L)).cast("long")
          .as("n_churn_points"))
      .select(col("mon"), col("n_orders"), col("n_censored"),
        col("n_churn_points"),
        when(col("n_orders") - col("n_censored") === 0, lit(0.0))
          .otherwise(round(col("n_churn_points").cast("double") /
            (col("n_orders") - col("n_censored")).cast("double"), 6))
          .as("churn_rate_r"))
      .orderBy("mon")
  }
  private val j29ChurnAntiJoinSql =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS d
      |  FROM orders),
      |a AS (SELECT MAX(d) AS edge FROM o),
      |m AS (SELECT o.d,
      |    date_diff('day', o.d, a.edge) < 90 AS censored,
      |    lead(o.d) OVER (PARTITION BY o.o_custkey
      |      ORDER BY o.d, o.o_orderkey) AS nxt
      |  FROM o CROSS JOIN a),
      |f AS (SELECT d, censored,
      |    NOT censored AND (nxt IS NULL
      |      OR date_diff('day', d, nxt) > 90) AS churn
      |  FROM m)
      |SELECT CAST(year(d) * 12 + month(d) AS BIGINT) AS mon,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_censored,
      |  CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_churn_points,
      |  CASE WHEN COUNT(*) - SUM(CASE WHEN censored THEN 1 ELSE 0 END)
      |      = 0 THEN 0.0
      |    ELSE round(CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END)
      |        AS DOUBLE)
      |      / CAST(COUNT(*) - SUM(CASE WHEN censored THEN 1 ELSE 0 END)
      |        AS DOUBLE), 6) END AS churn_rate_r
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a51_power_analysis" -> a51PowerAnalysis,
    "x13_retention_sweep" -> x13RetentionSweep,
    "j29_churn_anti_join" -> j29ChurnAntiJoin)

  val oracleSql: Map[String, String] = Map(
    "a51_power_analysis" -> a51PowerAnalysisSql,
    "x13_retention_sweep" -> x13RetentionSweepSql,
    "j29_churn_anti_join" -> j29ChurnAntiJoinSql)
}
