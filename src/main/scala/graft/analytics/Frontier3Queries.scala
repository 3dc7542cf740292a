package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 seventh-session widening: survival analysis (Kaplan–Meier
  * over time-to-purchase), exact CUSUM changepoint detection via the
  * prefix-sum/running-extremum decomposition, multiple linear
  * regression by normal equations (Cramer's rule over one-pass exact
  * sums), and Kendall's tau-b rank correlation computed from a
  * domain-bounded contingency table (never from row pairs).
  *
  * Determinism follows the house rules (SURVEY §11): exact
  * integer/decimal arithmetic end-to-end, every double born as ONE
  * expression over exact inputs (round-6 terms that must be summed
  * are frozen as DECIMAL(18,6) first), and a total ORDER BY on every
  * multi-row result.
  */
object Frontier3Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ev_survival_km — Kaplan–Meier survival curve for time from a
  // user's first event to their first purchase, right-censored at the
  // corpus end date. Durations are whole days with a calendar-bounded
  // domain, so the subject table collapses to a duration histogram
  // (one groupBy shuffle on the day key) and every window below runs
  // over ≤ |days| rows — never over users. n_at_risk(d) is a suffix
  // sum of the histogram; each KM factor ln(1 − d_i/n_i) is ONE
  // rounded double frozen as DECIMAL(18,6) so the cumulative log-
  // survival is an exact ordered-free decimal sum, and
  // S(d) = exp(Σ ln-terms) is one rounded double per step. A step
  // where every at-risk subject dies (factor 0) forces S = 0 from
  // then on via an exact flag — no ln(0) is ever evaluated.
  // ------------------------------------------------------------------
  private val evSurvivalKm: QFn = (s, dir) => {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        to_date(Tables.eventTs("ts")).as("d"))
    val endD = ev.agg(max(col("d")).as("end_d"))
    val perUser = ev.groupBy("user_id").agg(
      min(col("d")).as("first_d"),
      min(when(col("event_type") === "purchase", col("d"))).as("purch_d"))
    val subj = perUser.crossJoin(broadcast(endD))
      .select(
        when(col("purch_d").isNotNull,
          datediff(col("purch_d"), col("first_d")))
          .otherwise(datediff(col("end_d"), col("first_d"))).as("dur"),
        when(col("purch_d").isNotNull, 1L).otherwise(0L).as("ev"))
    val hist = subj.groupBy("dur").agg(
      sum(col("ev")).as("d_events"),
      sum(lit(1L) - col("ev")).as("c_events"),
      count(lit(1)).as("n_at"))
    val wSuf = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPre = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = hist.withColumn("n_risk", sum(col("n_at")).over(wSuf))
    val l = r
      .withColumn("lnterm",
        when(col("d_events") > 0 && col("n_risk") > col("d_events"),
          round(log((col("n_risk") - col("d_events")).cast("double") /
            col("n_risk").cast("double")), 6))
          .otherwise(lit(0.0)).cast(DecimalType(18, 6)))
      .withColumn("zf",
        when(col("d_events") > 0 && col("n_risk") === col("d_events"), 1L)
          .otherwise(0L))
    l.withColumn("cumln", sum(col("lnterm")).over(wPre))
      .withColumn("cumzf", sum(col("zf")).over(wPre))
      .filter(col("d_events") > 0)
      .select(col("dur").cast("long").as("dur"),
        col("n_risk").cast("long").as("n_risk"),
        col("d_events").cast("long").as("d_events"),
        col("c_events").cast("long").as("c_events"),
        when(col("cumzf") > 0, lit(0.0))
          .otherwise(round(exp(col("cumln").cast("double")), 6))
          .as("surv_r"))
      .orderBy("dur")
  }
  private val evSurvivalKmSql =
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS d
      |            FROM events),
      |ed AS (SELECT max(d) AS end_d FROM ev),
      |pu AS (SELECT user_id, min(d) AS first_d,
      |         min(CASE WHEN event_type = 'purchase' THEN d END) AS purch_d
      |       FROM ev GROUP BY 1),
      |subj AS (SELECT
      |    CASE WHEN purch_d IS NOT NULL
      |         THEN date_diff('day', first_d, purch_d)
      |         ELSE date_diff('day', first_d, end_d) END AS dur,
      |    CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM pu CROSS JOIN ed),
      |h AS (SELECT dur, SUM(ev) AS d_events, SUM(1 - ev) AS c_events,
      |        COUNT(*) AS n_at FROM subj GROUP BY 1),
      |r AS (SELECT dur, d_events, c_events,
      |        SUM(n_at) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND
      |          UNBOUNDED FOLLOWING) AS n_risk FROM h),
      |l AS (SELECT dur, d_events, c_events, n_risk,
      |        CASE WHEN d_events > 0 AND n_risk > d_events
      |          THEN CAST(round(ln(CAST(n_risk - d_events AS DOUBLE)
      |            / CAST(n_risk AS DOUBLE)), 6) AS DECIMAL(18,6))
      |          ELSE CAST(0 AS DECIMAL(18,6)) END AS lnterm,
      |        CASE WHEN d_events > 0 AND n_risk = d_events
      |          THEN 1 ELSE 0 END AS zf
      |      FROM r),
      |c AS (SELECT dur, d_events, c_events, n_risk,
      |        SUM(lnterm) OVER (ORDER BY dur) AS cumln,
      |        SUM(zf) OVER (ORDER BY dur) AS cumzf FROM l)
      |SELECT CAST(dur AS BIGINT) AS dur, CAST(n_risk AS BIGINT) AS n_risk,
      |  CAST(d_events AS BIGINT) AS d_events,
      |  CAST(c_events AS BIGINT) AS c_events,
      |  CASE WHEN cumzf > 0 THEN 0.0
      |       ELSE round(exp(CAST(CAST(cumln AS VARCHAR) AS DOUBLE)), 6)
      |  END AS surv_r
      |FROM c WHERE d_events > 0 ORDER BY dur""".stripMargin

  // ------------------------------------------------------------------
  // q29_cusum_shift — exact two-sided CUSUM changepoint detection over
  // daily revenue. The textbook recursion S⁺_t = max(0, S⁺_{t−1} +
  // x_t − μ − k) looks inherently sequential, but it has a closed
  // form: with P_t = Σ_{i≤t}(x_i − μ − k), S⁺_t = P_t − min(0,
  // min_{j≤t} P_j) — a prefix sum plus a running minimum, both plain
  // window aggregates (Page 1954 via the random-walk reflection
  // identity). Everything stays in exact DECIMAL: μ and the allowance
  // k = σ/2 are rounded once and frozen, so P/Q and both CUSUM
  // statistics are exact decimal arithmetic — the recursion is
  // reproduced bit-for-bit with no per-row iteration. The windows run
  // over the daily series (calendar-bounded); at 100 TB the only
  // data-sized work is the one groupBy building the daily rollup.
  // Flags mark days where either statistic exceeds h = 4σ.
  // ------------------------------------------------------------------
  private val q29CusumShift: QFn = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("rev"))
    val st = daily.agg(count(lit(1)).as("n"),
      sum(col("rev")).as("srev"), sum(col("rev") * col("rev")).as("ssrev"))
    val nD = col("n").cast("double")
    val sD = col("srev").cast("double")
    val ssD = col("ssrev").cast("double")
    val params = st.select(
      round(sD / nD, 4).cast(DecimalType(18, 4)).as("mu"),
      round(sqrt((ssD - sD * sD / nD) / nD), 4).cast(DecimalType(18, 4))
        .as("sd"))
      .select(col("mu"), col("sd"),
        round(col("sd").cast("double") / 2.0, 4).cast(DecimalType(18, 4))
          .as("k"),
        round(col("sd").cast("double") * 4.0, 4).cast(DecimalType(18, 4))
          .as("h"))
    val wPre = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = daily.crossJoin(broadcast(params))
      .withColumn("devp", col("rev") - col("mu") - col("k"))
      .withColumn("devm", col("rev") - col("mu") + col("k"))
    val cum = x
      .withColumn("p", sum(col("devp")).over(wPre))
      .withColumn("q", sum(col("devm")).over(wPre))
    cum
      .withColumn("s_plus",
        col("p") - least(lit(0).cast(DecimalType(18, 4)),
          min(col("p")).over(wPre)))
      .withColumn("s_minus",
        greatest(lit(0).cast(DecimalType(18, 4)),
          max(col("q")).over(wPre)) - col("q"))
      .select(col("d"),
        col("rev").cast("string").cast("double").as("rev_d"),
        col("s_plus").cast("string").cast("double").as("s_plus_d"),
        col("s_minus").cast("string").cast("double").as("s_minus_d"),
        when(col("s_plus") > col("h") || col("s_minus") > col("h"), 1)
          .otherwise(0).as("shift_flag"))
      .orderBy("d")
  }
  private val q29CusumShiftSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      |  FROM orders GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n, SUM(rev) AS srev,
      |         SUM(rev * rev) AS ssrev FROM daily),
      |pr AS (SELECT
      |    CAST(round(CAST(CAST(srev AS VARCHAR) AS DOUBLE)
      |      / CAST(n AS DOUBLE), 4) AS DECIMAL(18,4)) AS mu,
      |    CAST(round(sqrt((CAST(CAST(ssrev AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(srev AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(srev AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
      |      / CAST(n AS DOUBLE)), 4) AS DECIMAL(18,4)) AS sd
      |  FROM st),
      |pk AS (SELECT mu, sd,
      |    CAST(round(CAST(CAST(sd AS VARCHAR) AS DOUBLE) / 2.0, 4)
      |      AS DECIMAL(18,4)) AS k,
      |    CAST(round(CAST(CAST(sd AS VARCHAR) AS DOUBLE) * 4.0, 4)
      |      AS DECIMAL(18,4)) AS h
      |  FROM pr),
      |x AS (SELECT d, rev, rev - mu - k AS devp, rev - mu + k AS devm, h
      |      FROM daily CROSS JOIN pk),
      |c AS (SELECT d, rev, h,
      |        SUM(devp) OVER (ORDER BY d) AS p,
      |        SUM(devm) OVER (ORDER BY d) AS q FROM x),
      |c2 AS (SELECT d, rev, h,
      |        CAST(p AS DECIMAL(28,4)) AS p, CAST(q AS DECIMAL(28,4)) AS q
      |      FROM c),
      |c3 AS (SELECT d, rev, h, p, q,
      |        MIN(p) OVER (ORDER BY d) AS mp,
      |        MAX(q) OVER (ORDER BY d) AS mq FROM c2),
      |sc AS (SELECT d, rev, h,
      |        p - (CASE WHEN mp < 0 THEN mp
      |             ELSE CAST(0 AS DECIMAL(28,4)) END) AS s_plus,
      |        (CASE WHEN mq > 0 THEN mq
      |         ELSE CAST(0 AS DECIMAL(28,4)) END) - q AS s_minus
      |      FROM c3)
      |SELECT d, CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev_d,
      |  CAST(CAST(s_plus AS VARCHAR) AS DOUBLE) AS s_plus_d,
      |  CAST(CAST(s_minus AS VARCHAR) AS DOUBLE) AS s_minus_d,
      |  CASE WHEN s_plus > h OR s_minus > h THEN 1 ELSE 0 END AS shift_flag
      |FROM sc ORDER BY d""".stripMargin

  // ------------------------------------------------------------------
  // a31_multireg — multiple linear regression (2 regressors +
  // intercept) fitted in ONE aggregation pass: per-customer total
  // spend regressed on order count and account balance. The 3×3
  // normal equations are solved in closed form by Cramer's rule over
  // the ten exact sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁²,
  // Σx₁x₂, Σx₂², Σx₁y, Σx₂y, Σy²) — all BIGINT/DECIMAL, so the
  // shuffle carries ten numbers per partition and the model fits in
  // one map-side-combined groupBy no matter the table size. Each
  // coefficient is ONE double expression over the exact sums (both
  // engines evaluate the identical IEEE tree), rounded to 6; R² is
  // derived from the rounded coefficients via SSE = Σy² − b·[Σy,
  // Σx₁y, Σx₂y] so it, too, is deterministic.
  // ------------------------------------------------------------------
  private val a31Multireg: QFn = (s, dir) => {
    val spend = t(s, dir, "orders").groupBy("o_custkey").agg(
      count(lit(1)).as("x1"),
      sum(col("o_totalprice").cast(DecimalType(12, 2))).as("y"))
    val cust = t(s, dir, "customer").select(col("c_custkey"),
      col("c_acctbal").cast(DecimalType(12, 2)).as("x2"))
    val d = spend.join(cust, spend("o_custkey") === cust("c_custkey"))
    val m = d.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val sx1 = col("sx1").cast("double"); val sx2 = col("sx2").cast("double")
    val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")
    val det = n * (s11 * s22 - s12 * s12) -
      sx1 * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s12 - s11 * sx2)
    val b0 = round((sy * (s11 * s22 - s12 * s12) -
      sx1 * (s1y * s22 - s12 * s2y) + sx2 * (s1y * s12 - s11 * s2y)) / det, 6)
    val b1 = round((n * (s1y * s22 - s12 * s2y) -
      sy * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s2y - s1y * sx2)) / det, 6)
    val b2 = round((n * (s11 * s2y - s1y * s12) -
      sx1 * (sx1 * s2y - s1y * sx2) + sy * (sx1 * s12 - s11 * sx2)) / det, 6)
    m.select(col("n"), col("sy"), col("s1y"), col("s2y"), col("syy"),
        b0.as("b0_r"), b1.as("b1_r"), b2.as("b2_r"))
      .select(col("n"), col("b0_r"), col("b1_r"), col("b2_r"),
        round(lit(1.0) -
          (syy - col("b0_r") * sy - col("b1_r") * s1y - col("b2_r") * s2y) /
            (syy - sy * sy / n), 6).as("r2_r"))
  }
  private val a31MultiregSql = {
    val det = """(n * (s11 * s22 - s12 * s12)
      - sx1 * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s12 - s11 * sx2))"""
    s"""WITH spend AS (SELECT o_custkey, COUNT(*) AS x1,
       |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS y
       |  FROM orders GROUP BY 1),
       |d AS (SELECT spend.x1, CAST(c.c_acctbal AS DECIMAL(12,2)) AS x2,
       |        spend.y
       |      FROM spend JOIN customer c ON spend.o_custkey = c.c_custkey),
       |m AS (SELECT COUNT(*) AS n,
       |        SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
       |        SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
       |        SUM(x2 * x2) AS s22, SUM(x1 * y) AS s1y,
       |        SUM(x2 * y) AS s2y, SUM(y * y) AS syy
       |      FROM d),
       |md AS (SELECT CAST(n AS BIGINT) AS n0, CAST(n AS DOUBLE) AS n,
       |        CAST(CAST(sx1 AS VARCHAR) AS DOUBLE) AS sx1,
       |        CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) AS sx2,
       |        CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
       |        CAST(CAST(s11 AS VARCHAR) AS DOUBLE) AS s11,
       |        CAST(CAST(s12 AS VARCHAR) AS DOUBLE) AS s12,
       |        CAST(CAST(s22 AS VARCHAR) AS DOUBLE) AS s22,
       |        CAST(CAST(s1y AS VARCHAR) AS DOUBLE) AS s1y,
       |        CAST(CAST(s2y AS VARCHAR) AS DOUBLE) AS s2y,
       |        CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syy
       |      FROM m),
       |b AS (SELECT n0, n, sy, s1y, s2y, syy, sx1, sx2,
       |  round((sy * (s11 * s22 - s12 * s12)
       |    - sx1 * (s1y * s22 - s12 * s2y)
       |    + sx2 * (s1y * s12 - s11 * s2y)) / $det, 6) AS b0_r,
       |  round((n * (s1y * s22 - s12 * s2y)
       |    - sy * (sx1 * s22 - s12 * sx2)
       |    + sx2 * (sx1 * s2y - s1y * sx2)) / $det, 6) AS b1_r,
       |  round((n * (s11 * s2y - s1y * s12)
       |    - sx1 * (sx1 * s2y - s1y * sx2)
       |    + sy * (sx1 * s12 - s11 * sx2)) / $det, 6) AS b2_r
       |  FROM md)
       |SELECT n0 AS n, b0_r, b1_r, b2_r,
       |  round(1.0 - (syy - b0_r * sy - b1_r * s1y - b2_r * s2y)
       |    / (syy - sy * sy / n), 6) AS r2_r
       |FROM b""".stripMargin
  }

  // ------------------------------------------------------------------
  // a32_kendall_tau — Kendall's tau-b between lineitem quantity and
  // discount, computed EXACTLY without ever enumerating row pairs:
  // both variables have bounded domains (50 × 11), so the data
  // collapses to a contingency table in one groupBy and the
  // concordant/discordant tallies come from a cell-level theta join
  // (≤ |cells|² = 302k combinations — bounded by the domain, not the
  // data). A pair of rows is counted once at its lexicographically
  // larger cell: nc = Σ n_a·(Σ n_b : b.q < a.q, b.d < a.d),
  // nd = Σ n_a·(Σ n_b : b.q < a.q, b.d > a.d). Tie corrections use
  // the marginal histograms; products that would overflow BIGINT at
  // petabyte row counts are carried as DECIMAL(38,0). tau-b is one
  // rounded double over the exact tallies.
  // ------------------------------------------------------------------
  private val a32KendallTau: QFn = (s, dir) => {
    val cells = t(s, dir, "lineitem")
      .groupBy(col("l_quantity").cast("int").as("q"),
        round(col("l_discount") * 100).cast("int").as("disc"))
      .agg(count(lit(1)).as("cn"))
    val a = cells.select(col("q").as("qa"), col("disc").as("da"),
      col("cn").as("na"))
    val b = cells.select(col("q").as("qb"), col("disc").as("db"),
      col("cn").as("nb"))
    val pair = a.join(b, col("qb") < col("qa"))
      .groupBy("qa", "da", "na")
      .agg(sum(when(col("db") < col("da"), col("nb")).otherwise(0L))
             .as("cl"),
           sum(when(col("db") > col("da"), col("nb")).otherwise(0L))
             .as("cg"))
    val tallies = pair.agg(
      sum(col("na").cast(DecimalType(19, 0)) * col("cl")).as("nc"),
      sum(col("na").cast(DecimalType(19, 0)) * col("cg")).as("nd"))
    val qm = cells.groupBy("q").agg(sum("cn").as("qn"))
      .agg(sum(col("qn")).as("nn"),
        sum(col("qn").cast(DecimalType(19, 0)) * (col("qn") - 1)).as("t1x2"))
    val dm = cells.groupBy("disc").agg(sum("cn").as("dn"))
      .agg(sum(col("dn").cast(DecimalType(19, 0)) * (col("dn") - 1))
        .as("t2x2"))
    val nD = col("nn").cast("double")
    val n0x2 = nD * (nD - 1)
    val joined = tallies.crossJoin(broadcast(qm)).crossJoin(broadcast(dm))
    joined.select(
      col("nn").cast("long").as("n"),
      col("nc").cast("string").cast("double").as("nc_d"),
      col("nd").cast("string").cast("double").as("nd_d"),
      round(lit(2.0) *
        (col("nc").cast("double") - col("nd").cast("double")) /
        sqrt((n0x2 - col("t1x2").cast("double")) *
          (n0x2 - col("t2x2").cast("double"))), 6).as("tau_b_r"))
  }
  private val a32KendallTauSql =
    """WITH cells AS (SELECT CAST(l_quantity AS INT) AS q,
      |    CAST(round(l_discount * 100) AS INT) AS disc, COUNT(*) AS cn
      |  FROM lineitem GROUP BY 1, 2),
      |pair AS (SELECT a.q AS qa, a.disc AS da, a.cn AS na,
      |    SUM(CASE WHEN b.disc < a.disc THEN b.cn ELSE 0 END) AS cl,
      |    SUM(CASE WHEN b.disc > a.disc THEN b.cn ELSE 0 END) AS cg
      |  FROM cells a JOIN cells b ON b.q < a.q
      |  GROUP BY 1, 2, 3),
      |tal AS (SELECT SUM(CAST(na AS DECIMAL(19,0)) * cl) AS nc,
      |          SUM(CAST(na AS DECIMAL(19,0)) * cg) AS nd FROM pair),
      |qm AS (SELECT SUM(qn) AS nn,
      |         SUM(CAST(qn AS DECIMAL(19,0)) * (qn - 1)) AS t1x2
      |       FROM (SELECT q, SUM(cn) AS qn FROM cells GROUP BY 1)),
      |dm AS (SELECT SUM(CAST(dn AS DECIMAL(19,0)) * (dn - 1)) AS t2x2
      |       FROM (SELECT disc, SUM(cn) AS dn FROM cells GROUP BY 1))
      |SELECT CAST(nn AS BIGINT) AS n,
      |  CAST(CAST(nc AS VARCHAR) AS DOUBLE) AS nc_d,
      |  CAST(CAST(nd AS VARCHAR) AS DOUBLE) AS nd_d,
      |  round(2.0 * (CAST(CAST(nc AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(nd AS VARCHAR) AS DOUBLE))
      |    / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1)
      |        - CAST(CAST(t1x2 AS VARCHAR) AS DOUBLE))
      |      * (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1)
      |        - CAST(CAST(t2x2 AS VARCHAR) AS DOUBLE))), 6) AS tau_b_r
      |FROM tal CROSS JOIN qm CROSS JOIN dm""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ev_survival_km" -> evSurvivalKm,
    "q29_cusum_shift" -> q29CusumShift,
    "a31_multireg" -> a31Multireg,
    "a32_kendall_tau" -> a32KendallTau)

  val oracleSql: Map[String, String] = Map(
    "ev_survival_km" -> evSurvivalKmSql,
    "q29_cusum_shift" -> q29CusumShiftSql,
    "a31_multireg" -> a31MultiregSql,
    "a32_kendall_tau" -> a32KendallTauSql)
}
