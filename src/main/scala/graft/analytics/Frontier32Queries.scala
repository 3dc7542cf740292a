package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twentieth pack: count-model overdispersion
  * diagnostics (the variance-to-mean test that decides Poisson vs
  * negative-binomial before anyone fits either), Heaps'-law
  * vocabulary-growth fitting (V = k·Nᵝ — the corpus-linguistics
  * twin of the Zipf entry, and the empirical basis for every
  * "vocab stays sublinear" scale argument this repo makes), and
  * customer lifecycle stages (recency-band state machine + the
  * month-to-month transition matrix retention teams steer by).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier32Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // a53_overdispersion — is the per-user event count Poisson? The
  // index of dispersion D = s²/x̄ answers it from exact sufficient
  // statistics (n, Σc, Σc²); the chi-square form (n−1)·D against its
  // n−1 expectation flags overdispersion (D≫1 ⇒ negative binomial /
  // zero-inflation territory — the difference decides every count
  // model downstream). Also emits the implied negative-binomial
  // size parameter x̄²/(s²−x̄) when overdispersed. One groupBy + one
  // moment aggregate; every emitted number is ONE rounded double.
  // ------------------------------------------------------------------
  private val a53Overdispersion: QFn = (s, dir) => {
    val per = t(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val st = per.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast(DecimalType(38, 0)).as("sc"),
      sum((col("c") * col("c")).cast(DecimalType(38, 0))).as("scc"))
    val n = col("n").cast("double")
    val mean = col("sc").cast("double") / n
    val variance = (col("scc").cast("double") - mean * mean * n) / (n - 1)
    st.select(col("n").as("n_users"),
        round(mean, 6).as("mean_r"),
        round(variance, 6).as("var_r"),
        round(variance / mean, 6).as("dispersion_r"),
        (variance / mean > 1.5).as("overdispersed"),
        when(variance <= mean, lit(0.0))
          .otherwise(round(mean * mean / (variance - mean), 6))
          .as("nb_size_r"))
  }
  private val a53OverdispersionSql =
    """WITH per AS (SELECT user_id, COUNT(*) AS c FROM events
      |  GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(c) AS DECIMAL(38,0)) AS sc,
      |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
      |      AS scc
      |  FROM per),
      |d AS (SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
      |    CAST(CAST(sc AS VARCHAR) AS DOUBLE) AS scd,
      |    CAST(CAST(scc AS VARCHAR) AS DOUBLE) AS sccd
      |  FROM st)
      |SELECT n AS n_users,
      |  round(scd / nd, 6) AS mean_r,
      |  round((sccd - (scd / nd) * (scd / nd) * nd) / (nd - 1), 6)
      |    AS var_r,
      |  round(((sccd - (scd / nd) * (scd / nd) * nd) / (nd - 1))
      |    / (scd / nd), 6) AS dispersion_r,
      |  ((sccd - (scd / nd) * (scd / nd) * nd) / (nd - 1))
      |    / (scd / nd) > 1.5 AS overdispersed,
      |  CASE WHEN (sccd - (scd / nd) * (scd / nd) * nd) / (nd - 1)
      |      <= scd / nd THEN 0.0
      |    ELSE round((scd / nd) * (scd / nd)
      |      / ((sccd - (scd / nd) * (scd / nd) * nd) / (nd - 1)
      |        - scd / nd), 6) END AS nb_size_r
      |FROM d""".stripMargin

  // ------------------------------------------------------------------
  // t_heaps_fit — Heaps'-law fit of vocabulary growth: walking the
  // corpus in doc_id order, V(N) = distinct words after N tokens is
  // sampled at each document boundary (first occurrences marked by
  // a row_number over each word's global position — one window per
  // word key; the cumulative sums run over the bounded doc axis),
  // then ln V on ln N fits by the a14 OLS idiom. β well below 1 is
  // the sublinearity every vocab-keyed shuffle in this repo counts
  // on — here it's measured, not assumed.
  // ------------------------------------------------------------------
  private val tHeapsFit: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(TF.normText(col("text")), " "))
          .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val firstSeen = toks
      .withColumn("rn", row_number().over(
        Window.partitionBy("w").orderBy("doc_id", "pos")))
      .select(col("doc_id"),
        when(col("rn") === 1, 1L).otherwise(0L).as("is_new"))
    val perDoc = firstSeen.groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("is_new")).as("n_new"))
    val wCum = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perDoc
      .withColumn("cum_n", sum(col("n_toks")).over(wCum))
      .withColumn("cum_v", sum(col("n_new")).over(wCum))
      .select(
        round(log(col("cum_n").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("x"),
        round(log(col("cum_v").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("y"))
    val stats = curve.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx0"),
      sum((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy0"))
    val n = col("n")
    val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
    val sxx = col("sxx0").cast("double")
    val sxy = col("sxy0").cast("double")
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    stats.select(n.as("n_points"),
      round(beta, 6).as("beta_r"),
      round(exp((sy - beta * sx) / n), 6).as("k_r"),
      (round(beta, 6) < 1.0).as("sublinear"))
  }
  private val tHeapsFitSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS w,
       |    generate_subscripts(string_split($norm, ' '), 1) AS pos
       |  FROM documents),
       |tk AS (SELECT doc_id, pos, w FROM w0 WHERE length(w) > 0),
       |fs AS (SELECT doc_id,
       |    CASE WHEN row_number() OVER (PARTITION BY w
       |      ORDER BY doc_id, pos) = 1 THEN 1 ELSE 0 END AS is_new
       |  FROM tk),
       |pd AS (SELECT doc_id, COUNT(*) AS n_toks, SUM(is_new) AS n_new
       |  FROM fs GROUP BY 1),
       |curve AS (SELECT
       |    CAST(round(ln(CAST(SUM(n_toks) OVER wc AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS x,
       |    CAST(round(ln(CAST(SUM(n_new) OVER wc AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS y
       |  FROM pd
       |  WINDOW wc AS (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |st AS (SELECT COUNT(*) AS n, SUM(x) AS sx0, SUM(y) AS sy0,
       |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx0,
       |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy0
       |  FROM curve),
       |d AS (SELECT n,
       |    CAST(CAST(sx0 AS VARCHAR) AS DOUBLE) AS sx,
       |    CAST(CAST(sy0 AS VARCHAR) AS DOUBLE) AS sy,
       |    CAST(CAST(sxx0 AS VARCHAR) AS DOUBLE) AS sxx,
       |    CAST(CAST(sxy0 AS VARCHAR) AS DOUBLE) AS sxy
       |  FROM st)
       |SELECT n AS n_points,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta_r,
       |  round(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
       |    * sx) / n), 6) AS k_r,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) < 1.0
       |    AS sublinear
       |FROM d""".stripMargin
  }

  // ------------------------------------------------------------------
  // q47_lifecycle_stages — recency-band lifecycle machine: at each
  // month end a customer is NEW (first order this month), ACTIVE
  // (ordered within 3 months), LAPSED (3–6), or CHURNED (>6). The
  // per-customer monthly state needs only first-order month and a
  // months-since-last-order recency — both from one groupBy plus a
  // month-spine cross join (bounded: customers × months, the same
  // densification q15's gap-fill uses). The output is the aggregate
  // transition matrix between consecutive months — the retention
  // team's steering wheel. State logic is pure integer comparisons.
  // ------------------------------------------------------------------
  private val q47LifecycleStages: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("ck"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mon"))
    val perCust = o.groupBy("ck", "mon").agg(count(lit(1)).as("n"))
    val span = o.agg(min(col("mon")).as("m0"), max(col("mon")).as("m1"))
    val spine = perCust.select(col("ck")).distinct()
      .crossJoin(broadcast(span))
      .select(col("ck"), explode(sequence(col("m0"), col("m1")))
        .as("mon"))
    val wHist = Window.partitionBy("ck").orderBy("mon")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val states = spine
      .join(perCust, Seq("ck", "mon"), "left")
      .withColumn("ordered", when(col("n").isNotNull, 1L).otherwise(0L))
      .withColumn("last_mon",
        max(when(col("ordered") === 1, col("mon"))).over(wHist))
      .withColumn("first_mon",
        min(when(col("ordered") === 1, col("mon"))).over(wHist))
      .filter(col("first_mon").isNotNull)
      .select(col("ck"), col("mon"),
        when(col("first_mon") === col("mon"), lit("NEW"))
          .when(col("mon") - col("last_mon") <= 3, lit("ACTIVE"))
          .when(col("mon") - col("last_mon") <= 6, lit("LAPSED"))
          .otherwise(lit("CHURNED")).as("stage"))
    val wSeq = Window.partitionBy("ck").orderBy("mon")
    states
      .withColumn("nxt", lead(col("stage"), 1).over(wSeq))
      .filter(col("nxt").isNotNull)
      .groupBy(col("stage").as("from_stage"), col("nxt").as("to_stage"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_stage", "to_stage")
  }
  private val q47LifecycleStagesSql =
    """WITH o AS (SELECT o_custkey AS ck,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon
      |  FROM orders),
      |pc AS (SELECT ck, mon, COUNT(*) AS n FROM o GROUP BY 1, 2),
      |sp AS (SELECT MIN(mon) AS m0, MAX(mon) AS m1 FROM o),
      |spine AS (SELECT ck, unnest(generate_series(sp.m0, sp.m1)) AS mon
      |  FROM (SELECT DISTINCT ck FROM pc) c CROSS JOIN sp),
      |st0 AS (SELECT spine.ck, spine.mon,
      |    CASE WHEN pc.n IS NOT NULL THEN 1 ELSE 0 END AS ordered
      |  FROM spine LEFT JOIN pc ON pc.ck = spine.ck
      |    AND pc.mon = spine.mon),
      |st1 AS (SELECT ck, mon,
      |    MAX(CASE WHEN ordered = 1 THEN mon END) OVER wh AS last_mon,
      |    MIN(CASE WHEN ordered = 1 THEN mon END) OVER wh AS first_mon
      |  FROM st0
      |  WINDOW wh AS (PARTITION BY ck ORDER BY mon
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |st AS (SELECT ck, mon,
      |    CASE WHEN first_mon = mon THEN 'NEW'
      |      WHEN mon - last_mon <= 3 THEN 'ACTIVE'
      |      WHEN mon - last_mon <= 6 THEN 'LAPSED'
      |      ELSE 'CHURNED' END AS stage
      |  FROM st1 WHERE first_mon IS NOT NULL),
      |tr AS (SELECT stage AS from_stage,
      |    lead(stage) OVER (PARTITION BY ck ORDER BY mon) AS to_stage
      |  FROM st)
      |SELECT from_stage, to_stage, COUNT(*) AS n_transitions
      |FROM tr WHERE to_stage IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a53_overdispersion" -> a53Overdispersion,
    "t_heaps_fit" -> tHeapsFit,
    "q47_lifecycle_stages" -> q47LifecycleStages)

  val oracleSql: Map[String, String] = Map(
    "a53_overdispersion" -> a53OverdispersionSql,
    "t_heaps_fit" -> tHeapsFitSql,
    "q47_lifecycle_stages" -> q47LifecycleStagesSql)
}
