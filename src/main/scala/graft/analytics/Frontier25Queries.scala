package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, thirteenth pack: the sample-ratio-mismatch
  * guardrail (the first check every experimentation platform runs —
  * a skewed 50/50 split invalidates the experiment before any
  * metric is read), time-sliced completeness drift (incomplete-rate
  * trends with a planted outage, the DQ signal that catches an
  * upstream field going dark), and purchase-velocity flags (the
  * rolling-window fraud rule — the range frame at its most
  * operational).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier25Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ev_ab_srm_check — sample ratio mismatch: users hash-assign to
  // A/B via md5 parity (the deterministic assignment x-pack entries
  // already use), and the guardrail is the one-degree chi-square
  // statistic of observed-vs-expected 50/50 counts, computed in the
  // all-integer form (nA−nB)²/(nA+nB). Statistic > 3.84 (χ²₀.₀₅,₁)
  // flags the split. Also reported per event-type — a per-segment
  // SRM localizes WHICH funnel stage leaks users. Counting is one
  // groupBy over the assignment expression; nothing else moves.
  // ------------------------------------------------------------------
  private val evAbSrmCheck: QFn = (s, dir) => {
    val assigned = t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        (conv(substring(md5(concat(lit("ab:"),
          col("user_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2).as("arm"))
      .select(col("event_type"), col("user_id"), col("arm"))
      .distinct() // one vote per (stage, user)
    val per = assigned.groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
    val tot = assigned.select(col("user_id"), col("arm")).distinct()
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
      .select(lit("ALL").as("event_type"), col("na"), col("nb"))
    per.unionByName(tot)
      .select(col("event_type"), col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(((col("na") - col("nb")) * (col("na") - col("nb")))
          .cast("double") / (col("na") + col("nb")).cast("double"), 6)
          .as("chi2_r"),
        (((col("na") - col("nb")) * (col("na") - col("nb")))
          .cast("double") / (col("na") + col("nb")).cast("double")
          > 3.841459).as("srm_flag"))
      .orderBy("event_type")
  }
  private val evAbSrmCheckSql =
    """WITH a AS (SELECT DISTINCT event_type, user_id,
      |    CAST(('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)),
      |      1, 8)) AS BIGINT) % 2 AS arm
      |  FROM events),
      |per AS (SELECT event_type,
      |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
      |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      |  FROM a GROUP BY 1),
      |tot AS (SELECT 'ALL' AS event_type,
      |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
      |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      |  FROM (SELECT DISTINCT user_id, arm FROM a)),
      |u AS (SELECT * FROM per UNION ALL SELECT * FROM tot)
      |SELECT event_type, CAST(na AS BIGINT) AS n_a,
      |  CAST(nb AS BIGINT) AS n_b,
      |  round(CAST((na - nb) * (na - nb) AS DOUBLE)
      |    / CAST(na + nb AS DOUBLE), 6) AS chi2_r,
      |  CAST((na - nb) * (na - nb) AS DOUBLE)
      |    / CAST(na + nb AS DOUBLE) > 3.841459 AS srm_flag
      |FROM u ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // dq_completeness_trend — time-sliced completeness drift at DAILY
  // grain. The raw table ships with zero nulls, so the missingness
  // is PLANTED deterministically (the same planted-signal discipline
  // as the PII/URL entries): a 2% md5-derived base drop rate plus a
  // full-severity outage on day 17 (every even-hash event that day
  // loses its value). The operator is the real thing — daily
  // incomplete-rates, day-over-day delta via one lag(), a >5-point
  // drift flag — and the planted outage proves the alarm actually
  // fires exactly once and recovers exactly once. One scan, then
  // day-grain arithmetic.
  // ------------------------------------------------------------------
  private val dqCompletenessTrend: QFn = (s, dir) => {
    val h = conv(substring(md5(concat(lit("cq:"),
      col("event_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val daily = t(s, dir, "events")
      .select(expr("timestamp_micros(ts div 1000)").as("tsx"),
        col("event_id"))
      .select(dayofmonth(col("tsx")).cast("long").as("day"),
        when(h % 50 === 0 ||
          (dayofmonth(col("tsx")) === 17 && h % 2 === 0), 1L)
          .otherwise(0L).as("missing"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("missing")).as("nm"))
    val w = Window.orderBy("day")
    daily
      .select(col("day"), col("n").cast("long").as("n_events"),
        round(col("nm").cast("double") / col("n").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("missing_rate"))
      .withColumn("prev", lag(col("missing_rate"), 1).over(w))
      .select(col("day"), col("n_events"),
        col("missing_rate").cast("string").as("missing_rate"),
        (col("prev").isNotNull &&
          abs(col("missing_rate") - col("prev")) > 0.05)
          .as("drift_flag"))
      .orderBy("day")
  }
  private val dqCompletenessTrendSql =
    """WITH e AS (SELECT day(ts) AS day,
      |    CASE WHEN CAST(('0x' || substring(md5('cq:'
      |        || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 50 = 0
      |      OR (day(ts) = 17
      |        AND CAST(('0x' || substring(md5('cq:'
      |          || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0)
      |    THEN 1 ELSE 0 END AS missing
      |  FROM events),
      |m AS (SELECT day, COUNT(*) AS n, SUM(missing) AS nm FROM e
      |  GROUP BY 1),
      |r AS (SELECT CAST(day AS BIGINT) AS day,
      |    CAST(n AS BIGINT) AS n_events,
      |    CAST(round(CAST(nm AS DOUBLE) / CAST(n AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS missing_rate
      |  FROM m)
      |SELECT day, n_events,
      |  CAST(missing_rate AS VARCHAR) AS missing_rate,
      |  lag(missing_rate) OVER (ORDER BY day) IS NOT NULL
      |    AND abs(missing_rate - lag(missing_rate) OVER (ORDER BY day))
      |      > 0.05 AS drift_flag
      |FROM r ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // ev_velocity_flags — rolling-window velocity rule: for every
  // purchase, count the same user's purchases in the trailing HOUR
  // (a RANGE frame on the second-granular event time, per user
  // partition); users whose peak velocity reaches 2+ flag as
  // high-velocity (the one-month synthetic stream tops out there —
  // the threshold is config, the frame is the operator). The range
  // frame is the operational form of "N transactions per window" —
  // per-user partitions keep it key-parallel at any scale. Output:
  // per flagged user their peak burst size and when it peaked
  // (earliest peak, total tie-break).
  // ------------------------------------------------------------------
  private val evVelocityFlags: QFn = (s, dir) => {
    val p = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-3600, 0)
    val counted = p.withColumn("burst", count(lit(1)).over(w))
    val peak = counted.groupBy("user_id")
      .agg(max(col("burst")).as("peak_burst"))
      .filter(col("peak_burst") >= 2)
    counted.join(peak, "user_id")
      .filter(col("burst") === col("peak_burst"))
      .groupBy("user_id", "peak_burst")
      .agg(min(col("sec")).as("peak_sec"),
        count(lit(1)).as("n_at_peak"))
      .select(col("user_id"), col("peak_burst").cast("long")
        .as("peak_burst"), col("peak_sec").cast("long").as("peak_sec"),
        col("n_at_peak").cast("long").as("n_at_peak"))
      .orderBy("user_id")
  }
  private val evVelocityFlagsSql =
    """WITH p AS (SELECT user_id, event_id,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, sec,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
      |      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS burst
      |  FROM p),
      |pk AS (SELECT user_id, MAX(burst) AS peak_burst FROM c
      |  GROUP BY 1 HAVING MAX(burst) >= 2)
      |SELECT c.user_id, CAST(pk.peak_burst AS BIGINT) AS peak_burst,
      |  CAST(MIN(c.sec) AS BIGINT) AS peak_sec,
      |  COUNT(*) AS n_at_peak
      |FROM c JOIN pk ON pk.user_id = c.user_id
      |  AND c.burst = pk.peak_burst
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ev_ab_srm_check" -> evAbSrmCheck,
    "dq_completeness_trend" -> dqCompletenessTrend,
    "ev_velocity_flags" -> evVelocityFlags)

  val oracleSql: Map[String, String] = Map(
    "ev_ab_srm_check" -> evAbSrmCheckSql,
    "dq_completeness_trend" -> dqCompletenessTrendSql,
    "ev_velocity_flags" -> evVelocityFlagsSql)
}
