package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, third pack: l-diversity privacy auditing (the
  * Machanavajjhala et al. 2007 strengthening of k-anonymity the x6
  * entry already covers), IQR-fence outlier profiling (the Tukey
  * boxplot rule every DQ dashboard draws), and a two-round
  * gradient-boosted regression-stump fit (squared loss, exact
  * variance-reduction split search over month bins — the smallest
  * honest GBM: fit, residual, fit again).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier15Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // x10_l_diversity — distinct l-diversity audit over the release
  // quasi-identifier (nation, market segment): a QI group is safe
  // when its SENSITIVE attribute (order priority) takes ≥ l distinct
  // values, so an attacker who pins a target to a group still cannot
  // infer the sensitive value. k-anonymity (x6) bounds group SIZE;
  // this bounds group DISVERSITY — the attack it closes is the
  // homogeneous group, which k-anonymity happily releases. Per group:
  // record count, distinct-sensitive count l, the l≥3 verdict, and
  // the top sensitive value's share (the skew an entropy-l audit
  // would flag) — ONE rounded double each. Two key-partitioned
  // aggregations, no row ever leaves its (nation, segment) shard.
  // ------------------------------------------------------------------
  private val x10LDiversity: QFn = (s, dir) => {
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_orderpriority"))
    val cell = rows.groupBy("n_name", "c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("nv"))
    cell.groupBy("n_name", "c_mktsegment")
      .agg(sum(col("nv")).as("n_records"),
        count(lit(1)).as("l_distinct"),
        max(col("nv")).as("top_nv"))
      .select(col("n_name"), col("c_mktsegment"),
        col("n_records").cast("long").as("n_records"),
        col("l_distinct"),
        (col("l_distinct") >= 3).as("l3_ok"),
        round(col("top_nv").cast("double") /
          col("n_records").cast("double"), 6).as("top_share_r"))
      .orderBy("n_name", "c_mktsegment")
  }
  private val x10LDiversitySql =
    """WITH rows0 AS (SELECT n_name, c_mktsegment, o_orderpriority
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |cell AS (SELECT n_name, c_mktsegment, o_orderpriority,
      |    COUNT(*) AS nv
      |  FROM rows0 GROUP BY 1, 2, 3)
      |SELECT n_name, c_mktsegment,
      |  CAST(SUM(nv) AS BIGINT) AS n_records,
      |  COUNT(*) AS l_distinct,
      |  COUNT(*) >= 3 AS l3_ok,
      |  round(CAST(MAX(nv) AS DOUBLE) / CAST(SUM(nv) AS DOUBLE), 6)
      |    AS top_share_r
      |FROM cell GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // dq_iqr_outliers — Tukey boxplot outlier audit per market segment:
  // Q1/Q3 are the exact interpolated quartiles (the percentile
  // definition both engines share, proved by a_percentiles), fences
  // sit at 1.5·IQR, and the outlier population is counted + key-
  // checksummed so the driver pins exactly WHICH orders fall outside,
  // not just how many. The quartile pass and the fence pass are two
  // key-partitioned aggregations over the same shuffle key — at 100 TB
  // the quartiles would swap to approx_percentile with the same
  // two-pass shape (the b2/a_percentiles pattern).
  // ------------------------------------------------------------------
  private val dqIqrOutliers: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
    val q = o.groupBy("c_mktsegment")
      .agg(expr("percentile(o_totalprice, 0.25)").as("q1"),
        expr("percentile(o_totalprice, 0.75)").as("q3"))
      .select(col("c_mktsegment").as("seg"), col("q1"), col("q3"))
    o.join(broadcast(q), col("c_mktsegment") === col("seg"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") < col("lo") ||
          col("o_totalprice") > col("hi"), 1L).otherwise(0L))
          .as("n_outliers"),
        coalesce(sum(when(col("o_totalprice") < col("lo") ||
          col("o_totalprice") > col("hi"), col("o_orderkey")))
          .cast("long"), lit(0L)).as("outlier_checksum"),
        round(min(col("lo")), 4).as("lo_fence_r"),
        round(min(col("hi")), 4).as("hi_fence_r"))
      .orderBy("c_mktsegment")
  }
  private val dqIqrOutliersSql =
    """WITH o AS (SELECT c_mktsegment, o_orderkey, o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |q AS (SELECT c_mktsegment AS seg,
      |    quantile_cont(o_totalprice, 0.25) AS q1,
      |    quantile_cont(o_totalprice, 0.75) AS q3
      |  FROM o GROUP BY 1),
      |f AS (SELECT o.*, q.q1 - 1.5 * (q.q3 - q.q1) AS lo,
      |    q.q3 + 1.5 * (q.q3 - q.q1) AS hi
      |  FROM o JOIN q ON o.c_mktsegment = q.seg)
      |SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  COALESCE(CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
      |      THEN o_orderkey END) AS BIGINT), 0) AS outlier_checksum,
      |  round(MIN(lo), 4) AS lo_fence_r,
      |  round(MIN(hi), 4) AS hi_fence_r
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // ml_gbt_stumps — two gradient-boosting rounds of depth-1 regression
  // trees on monthly bins: round 1 fits o_totalprice, round 2 fits the
  // residuals, each round choosing the month threshold that minimizes
  // total SSE via exact sufficient statistics (per-bin n, Σy, Σy² in
  // DECIMAL — the cumulative prefix over ~24 ordered bins is an exact
  // decimal window sum, so the split search compares identically-
  // computed doubles in both engines; ties break on the smaller
  // threshold). Leaf means are ONE rounded double frozen as
  // DECIMAL(18,6); residuals freeze at DECIMAL(18,4) before the
  // second round's Σr². The raw table shuffles once per round onto
  // the month key — split search itself runs on the bin aggregate,
  // which is data-scale-invariant. This is the inner loop of every
  // histogram-based GBM (LightGBM/XGBoost hist mode), expressed as
  // two declarative passes.
  // ------------------------------------------------------------------
  private val mlGbtStumps: QFn = (s, dir) => {
    def fitStump(rows: DataFrame): DataFrame = {
      // rows: (bin LONG, y DECIMAL) → 1 row (thr, lm, rm, sse_m_r)
      val bins = rows.groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast(DecimalType(38, 4)).as("sy"),
          sum(col("y") * col("y")).cast(DecimalType(38, 8)).as("qy"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = bins
        .withColumn("nl", sum(col("n")).over(wc))
        .withColumn("sl", sum(col("sy")).over(wc).cast(DecimalType(38, 4)))
        .withColumn("ql", sum(col("qy")).over(wc).cast(DecimalType(38, 8)))
      val tot = bins.agg(sum(col("n")).as("nt"),
        sum(col("sy")).cast(DecimalType(38, 4)).as("st"),
        sum(col("qy")).cast(DecimalType(38, 8)).as("qt"))
      val cand = cum.crossJoin(broadcast(tot))
        .filter(col("nl") < col("nt")) // right side non-empty
        .select(col("bin").as("thr"), col("nl"), col("sl"), col("ql"),
          (col("nt") - col("nl")).as("nr"),
          (col("st") - col("sl")).as("sr"),
          (col("qt") - col("ql")).as("qr"))
        .select(col("thr"), col("nl"), col("sl"), col("nr"), col("sr"),
          round((
            (col("ql").cast("double") -
              col("sl").cast("double") * col("sl").cast("double") /
                col("nl").cast("double")) +
            (col("qr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double") /
                col("nr").cast("double"))) / lit(1e6), 4).as("sse_m_r"))
      val wBest = Window.orderBy(col("sse_m_r").asc, col("thr").asc)
      cand.withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
        .select(col("thr"),
          round(col("sl").cast("double") / col("nl").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("lm"),
          round(col("sr").cast("double") / col("nr").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("rm"),
          col("sse_m_r"))
    }
    val rows = t(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("bin"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("y"))
      .localCheckpoint(true)
    val s1 = fitStump(rows).localCheckpoint(true)
    val rows2 = rows.crossJoin(broadcast(s1.select(col("thr").as("t1"),
        col("lm").as("lm1"), col("rm").as("rm1"))))
      .select(col("bin"),
        round(col("y") - when(col("bin") <= col("t1"), col("lm1"))
          .otherwise(col("rm1")), 4).cast(DecimalType(18, 4)).as("y"))
    val s2 = fitStump(rows2)
    s1.select(lit(1).as("rnd"), col("thr"),
        col("lm").cast("string").as("left_mean"),
        col("rm").cast("string").as("right_mean"), col("sse_m_r"))
      .unionByName(s2.select(lit(2).as("rnd"), col("thr"),
        col("lm").cast("string").as("left_mean"),
        col("rm").cast("string").as("right_mean"), col("sse_m_r")))
      .orderBy("rnd")
  }
  private val mlGbtStumpsSql = {
    def fit(src: String): String =
      s"""bins_$src AS (SELECT bin, COUNT(*) AS n,
         |    CAST(SUM(y) AS DECIMAL(38,4)) AS sy,
         |    CAST(SUM(CAST(y AS DECIMAL(28,4)) * y) AS DECIMAL(38,8)) AS qy
         |  FROM $src GROUP BY 1),
         |cum_$src AS (SELECT bin,
         |    SUM(n) OVER wb AS nl,
         |    CAST(SUM(sy) OVER wb AS DECIMAL(38,4)) AS sl,
         |    CAST(SUM(qy) OVER wb AS DECIMAL(38,8)) AS ql
         |  FROM bins_$src
         |  WINDOW wb AS (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot_$src AS (SELECT SUM(n) AS nt,
         |    CAST(SUM(sy) AS DECIMAL(38,4)) AS st,
         |    CAST(SUM(qy) AS DECIMAL(38,8)) AS qt
         |  FROM bins_$src),
         |cand_$src AS (SELECT bin AS thr, nl, sl, nt - nl AS nr,
         |    st - sl AS sr,
         |    round(((CAST(ql AS DOUBLE)
         |        - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
         |          / CAST(nl AS DOUBLE))
         |      + (CAST(qt - ql AS DOUBLE)
         |        - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
         |          / CAST(nt - nl AS DOUBLE))) / 1e6, 4) AS sse_m_r
         |  FROM cum_$src CROSS JOIN tot_$src WHERE nl < nt),
         |best_$src AS (SELECT thr,
         |    CAST(round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS lm,
         |    CAST(round(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS rm,
         |    sse_m_r
         |  FROM cand_$src
         |  QUALIFY row_number() OVER (ORDER BY sse_m_r, thr) = 1)""".stripMargin
    s"""WITH r1 AS (SELECT
       |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
       |      AS bin,
       |    CAST(o_totalprice AS DECIMAL(18,4)) AS y
       |  FROM orders),
       |${fit("r1")},
       |r2 AS (SELECT r1.bin,
       |    CAST(round(r1.y - CASE WHEN r1.bin <= b.thr THEN b.lm
       |      ELSE b.rm END, 4) AS DECIMAL(18,4)) AS y
       |  FROM r1 CROSS JOIN best_r1 b),
       |${fit("r2")}
       |SELECT 1 AS rnd, thr, CAST(lm AS VARCHAR) AS left_mean,
       |  CAST(rm AS VARCHAR) AS right_mean, sse_m_r FROM best_r1
       |UNION ALL
       |SELECT 2, thr, CAST(lm AS VARCHAR), CAST(rm AS VARCHAR), sse_m_r
       |FROM best_r2
       |ORDER BY rnd""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "x10_l_diversity" -> x10LDiversity,
    "dq_iqr_outliers" -> dqIqrOutliers,
    "ml_gbt_stumps" -> mlGbtStumps)

  val oracleSql: Map[String, String] = Map(
    "x10_l_diversity" -> x10LDiversitySql,
    "dq_iqr_outliers" -> dqIqrOutliersSql,
    "ml_gbt_stumps" -> mlGbtStumpsSql)
}
