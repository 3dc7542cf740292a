package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, nineteenth pack: k-fold cross-validation of the
  * histogram stump (train on k−1 hash folds, score on the held-out
  * fold — the generalization measurement that separates a model
  * from a memorizer), Wilson score intervals for conversion rates
  * (the binomial CI that behaves at small n and extreme p, unlike
  * the normal approximation), and a composite engagement index
  * (min-max-normalized weighted KPI blend — the scorecard metric
  * every growth dashboard tracks).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier31Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ml_kfold_cv — 3-fold cross-validation of the month-bin regression
  // stump (the ml_gbt_stumps fitter): folds are md5 hash classes of
  // the order key (deterministic, coordination-free), each fold's
  // model fits on the other two and reports TRAIN and VALIDATION
  // mean squared error (per-row squared residuals in exact decimal,
  // ONE rounded double per emitted mse). The gap between the two
  // columns IS the overfit measurement. Each fold is one bin-stat
  // aggregation + one scoring pass — 3 folds cost 3 bounded scans,
  // embarrassingly parallel within each.
  // ------------------------------------------------------------------
  private val mlKfoldCv: QFn = (s, dir) => {
    val rows = t(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("bin"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("y"),
        (conv(substring(md5(concat(lit("cv:"),
          col("o_orderkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 3).as("fold"))
      .localCheckpoint(true)
    def fitAndScore(k: Int): DataFrame = {
      val train = rows.filter(col("fold") =!= k)
      val bins = train.groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast(DecimalType(38, 4)).as("sy"),
          sum((col("y") * col("y")).cast(DecimalType(38, 8))).as("qy"))
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
        .filter(col("nl") < col("nt"))
        .select(col("bin").as("thr"), col("nl"), col("sl"),
          (col("nt") - col("nl")).as("nr"), (col("st") - col("sl"))
            .as("sr"),
          round(((col("ql").cast("double") -
            col("sl").cast("double") * col("sl").cast("double") /
              col("nl").cast("double")) +
            ((col("qt") - col("ql")).cast("double") -
              (col("st") - col("sl")).cast("double") *
              (col("st") - col("sl")).cast("double") /
                (col("nt") - col("nl")).cast("double"))) / lit(1e6), 4)
            .as("sse_m"))
      val best = cand
        .withColumn("rk", row_number().over(
          Window.orderBy(col("sse_m").asc, col("thr").asc)))
        .filter(col("rk") === 1)
        .select(col("thr"),
          round(col("sl").cast("double") / col("nl").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("lm"),
          round(col("sr").cast("double") / col("nr").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("rm"))
      val scored = rows.crossJoin(broadcast(best))
        .select(col("fold"),
          (round(col("y") - when(col("bin") <= col("thr"), col("lm"))
            .otherwise(col("rm")), 4).cast(DecimalType(18, 4))).as("r"))
        .select(col("fold"),
          (col("r") * col("r")).cast(DecimalType(38, 8)).as("r2"))
      scored.groupBy()
        .agg(
          sum(when(col("fold") =!= k, col("r2"))).as("str"),
          sum(when(col("fold") =!= k, 1L).otherwise(0L)).as("ntr"),
          sum(when(col("fold") === k, col("r2"))).as("sva"),
          sum(when(col("fold") === k, 1L).otherwise(0L)).as("nva"))
        .select(lit(k).as("fold"),
          round(col("str").cast("double") / col("ntr").cast("double") /
            lit(1e6), 6).as("train_mse_m_r"),
          round(col("sva").cast("double") / col("nva").cast("double") /
            lit(1e6), 6).as("val_mse_m_r"))
    }
    fitAndScore(0).unionByName(fitAndScore(1)).unionByName(fitAndScore(2))
      .orderBy("fold")
  }
  private val mlKfoldCvSql = {
    def fold(k: Int): String =
      s"""bins_$k AS (SELECT bin, COUNT(*) AS n,
         |    CAST(SUM(y) AS DECIMAL(38,4)) AS sy,
         |    CAST(SUM(CAST(y AS DECIMAL(28,4)) * y) AS DECIMAL(38,8))
         |      AS qy
         |  FROM rows0 WHERE fold <> $k GROUP BY 1),
         |cum_$k AS (SELECT bin, SUM(n) OVER wb AS nl,
         |    CAST(SUM(sy) OVER wb AS DECIMAL(38,4)) AS sl,
         |    CAST(SUM(qy) OVER wb AS DECIMAL(38,8)) AS ql
         |  FROM bins_$k
         |  WINDOW wb AS (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot_$k AS (SELECT SUM(n) AS nt,
         |    CAST(SUM(sy) AS DECIMAL(38,4)) AS st,
         |    CAST(SUM(qy) AS DECIMAL(38,8)) AS qt FROM bins_$k),
         |cand_$k AS (SELECT bin AS thr, nl, sl, nt - nl AS nr,
         |    st - sl AS sr,
         |    round(((CAST(ql AS DOUBLE)
         |        - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
         |          / CAST(nl AS DOUBLE))
         |      + (CAST(qt - ql AS DOUBLE)
         |        - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
         |          / CAST(nt - nl AS DOUBLE))) / 1e6, 4) AS sse_m
         |  FROM cum_$k CROSS JOIN tot_$k WHERE nl < nt),
         |best_$k AS (SELECT thr,
         |    CAST(round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS lm,
         |    CAST(round(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS rm
         |  FROM cand_$k
         |  QUALIFY row_number() OVER (ORDER BY sse_m, thr) = 1),
         |sc_$k AS (SELECT rows0.fold,
         |    CAST(CAST(round(rows0.y - CASE WHEN rows0.bin <= b.thr
         |        THEN b.lm ELSE b.rm END, 4) AS DECIMAL(18,4))
         |      AS DECIMAL(28,4))
         |    * CAST(round(rows0.y - CASE WHEN rows0.bin <= b.thr
         |        THEN b.lm ELSE b.rm END, 4) AS DECIMAL(18,4)) AS r2
         |  FROM rows0 CROSS JOIN best_$k b),
         |res_$k AS (SELECT $k AS fold,
         |    round(CAST(SUM(CASE WHEN fold <> $k THEN r2 END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN fold <> $k THEN 1 ELSE 0 END)
         |        AS DOUBLE) / 1e6, 6) AS train_mse_m_r,
         |    round(CAST(SUM(CASE WHEN fold = $k THEN r2 END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN fold = $k THEN 1 ELSE 0 END)
         |        AS DOUBLE) / 1e6, 6) AS val_mse_m_r
         |  FROM sc_$k)""".stripMargin
    s"""WITH rows0 AS (SELECT
       |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
       |      AS bin,
       |    CAST(o_totalprice AS DECIMAL(18,4)) AS y,
       |    CAST(('0x' || substring(md5('cv:'
       |      || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 3
       |      AS fold
       |  FROM orders),
       |${fold(0)},
       |${fold(1)},
       |${fold(2)}
       |SELECT * FROM res_0 UNION ALL SELECT * FROM res_1
       |UNION ALL SELECT * FROM res_2 ORDER BY fold""".stripMargin
  }

  // ------------------------------------------------------------------
  // a52_wilson_interval — Wilson score CI (95%) for each segment's
  // "urgent order" rate: the binomial interval that stays inside
  // [0,1] and behaves at small counts, computed in its closed form
  // from exact (successes, trials). Every bound is ONE rounded
  // double over exact integers with the z literal shared by both
  // engines — the CI a dashboard should draw instead of ±1.96√pq/n.
  // ------------------------------------------------------------------
  private val a52WilsonInterval: QFn = (s, dir) => {
    val st = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).cast("long").as("k"))
    val z = lit(1.959964)
    val n = col("n").cast("double"); val k = col("k").cast("double")
    val p = k / n
    val denom = lit(1.0) + z * z / n
    val center = (p + z * z / (n * 2)) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / n +
      z * z / (n * n * 4)) / denom
    st.select(col("c_mktsegment"), col("n"), col("k"),
        round(p, 6).as("rate_r"),
        round(center - half, 6).as("wilson_lo_r"),
        round(center + half, 6).as("wilson_hi_r"))
      .orderBy("c_mktsegment")
  }
  private val a52WilsonIntervalSql =
    """WITH st AS (SELECT c_mktsegment, COUNT(*) AS n,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
      |      AS k
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |d AS (SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
      |    CAST(k AS BIGINT) AS k,
      |    CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd
      |  FROM st)
      |SELECT c_mktsegment, n, k,
      |  round(kd / nd, 6) AS rate_r,
      |  round((kd / nd + 1.959964 * 1.959964 / (nd * 2))
      |      / (1.0 + 1.959964 * 1.959964 / nd)
      |    - 1.959964 * sqrt((kd / nd) * (1.0 - kd / nd) / nd
      |        + 1.959964 * 1.959964 / (nd * nd * 4))
      |      / (1.0 + 1.959964 * 1.959964 / nd), 6) AS wilson_lo_r,
      |  round((kd / nd + 1.959964 * 1.959964 / (nd * 2))
      |      / (1.0 + 1.959964 * 1.959964 / nd)
      |    + 1.959964 * sqrt((kd / nd) * (1.0 - kd / nd) / nd
      |        + 1.959964 * 1.959964 / (nd * nd * 4))
      |      / (1.0 + 1.959964 * 1.959964 / nd), 6) AS wilson_hi_r
      |FROM d ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // ev_engagement_index — the composite scorecard: per user, three
  // KPIs (event count, active days, purchase count) min-max
  // normalize across the user base (exact integer min/max from one
  // pass over the per-user aggregate) and blend 50/30/20 into one
  // index — each normalized term ONE rounded double frozen as
  // DECIMAL so the blend is exact. Reported as the decile histogram
  // of the index (bounded output) with per-bucket user checksums.
  // Composite indices are how growth teams rank cohorts; the min-max
  // frame is the piece that must be computed globally (two scalars
  // per KPI — a broadcast, not a shuffle).
  // ------------------------------------------------------------------
  private val evEngagementIndex: QFn = (s, dir) => {
    val per = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 86400000000000").as("day"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        countDistinct(col("day")).as("n_days"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_buy"))
      .localCheckpoint(true)
    val mm = per.agg(
      min(col("n_ev")).as("ev_lo"), max(col("n_ev")).as("ev_hi"),
      min(col("n_days")).as("dy_lo"), max(col("n_days")).as("dy_hi"),
      min(col("n_buy")).as("by_lo"), max(col("n_buy")).as("by_hi"))
    def norm(c: String, lo: String, hi: String) =
      when(col(hi) === col(lo), lit(0.0))
        .otherwise(round((col(c) - col(lo)).cast("double") /
          (col(hi) - col(lo)).cast("double"), 6))
    val idx = per.crossJoin(broadcast(mm))
      .select(col("user_id"),
        (norm("n_ev", "ev_lo", "ev_hi").cast(DecimalType(18, 6)) *
          lit(BigDecimal("0.5")).cast(DecimalType(18, 6)) +
         norm("n_days", "dy_lo", "dy_hi").cast(DecimalType(18, 6)) *
          lit(BigDecimal("0.3")).cast(DecimalType(18, 6)) +
         norm("n_buy", "by_lo", "by_hi").cast(DecimalType(18, 6)) *
          lit(BigDecimal("0.2")).cast(DecimalType(18, 6))).as("ei"))
    idx.select(floor(col("ei").cast("double") * 10).cast("long")
        .as("decile"), col("user_id"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_id")).cast("long").as("id_checksum"))
      .orderBy("decile")
  }
  private val evEngagementIndexSql =
    """WITH per AS (SELECT user_id, COUNT(*) AS n_ev,
      |    COUNT(DISTINCT epoch_us(ts) // 86400000000) AS n_days,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS n_buy
      |  FROM events GROUP BY 1),
      |mm AS (SELECT MIN(n_ev) AS ev_lo, MAX(n_ev) AS ev_hi,
      |    MIN(n_days) AS dy_lo, MAX(n_days) AS dy_hi,
      |    MIN(n_buy) AS by_lo, MAX(n_buy) AS by_hi
      |  FROM per),
      |idx AS (SELECT user_id,
      |    CAST(CASE WHEN ev_hi = ev_lo THEN 0.0
      |      ELSE round(CAST(n_ev - ev_lo AS DOUBLE)
      |        / CAST(ev_hi - ev_lo AS DOUBLE), 6) END
      |      AS DECIMAL(18,6)) * CAST(0.5 AS DECIMAL(18,6))
      |    + CAST(CASE WHEN dy_hi = dy_lo THEN 0.0
      |      ELSE round(CAST(n_days - dy_lo AS DOUBLE)
      |        / CAST(dy_hi - dy_lo AS DOUBLE), 6) END
      |      AS DECIMAL(18,6)) * CAST(0.3 AS DECIMAL(18,6))
      |    + CAST(CASE WHEN by_hi = by_lo THEN 0.0
      |      ELSE round(CAST(n_buy - by_lo AS DOUBLE)
      |        / CAST(by_hi - by_lo AS DOUBLE), 6) END
      |      AS DECIMAL(18,6)) * CAST(0.2 AS DECIMAL(18,6)) AS ei
      |  FROM per CROSS JOIN mm)
      |SELECT CAST(floor(CAST(ei AS DOUBLE) * 10) AS BIGINT) AS decile,
      |  COUNT(*) AS n_users,
      |  CAST(SUM(user_id) AS BIGINT) AS id_checksum
      |FROM idx GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ml_kfold_cv" -> mlKfoldCv,
    "a52_wilson_interval" -> a52WilsonInterval,
    "ev_engagement_index" -> evEngagementIndex)

  val oracleSql: Map[String, String] = Map(
    "ml_kfold_cv" -> mlKfoldCvSql,
    "a52_wilson_interval" -> a52WilsonIntervalSql,
    "ev_engagement_index" -> evEngagementIndexSql)
}
