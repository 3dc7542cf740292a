package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 tenth-session widening: in-engine model TRAINING (logistic
  * regression by two unrolled Newton–Raphson steps whose data pass is
  * a 6-number aggregate), log-log demand elasticity per brand, and
  * distribution-free confidence intervals for the median from
  * order-statistic ranks — the "fit a model without leaving the
  * warehouse" tier above the descriptive stats packs.
  *
  * House determinism rules: every nonlinear scalar (sigmoid, ln) is
  * ONE double expression over exact decimal inputs, rounded to 6 and
  * re-frozen as DECIMAL before it enters any sum; all sums are exact
  * decimal/integer; total ORDER BY everywhere.
  */
object Frontier6Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ml_logreg_newton — logistic regression (urgent-priority flag on
  // log order price) trained by TWO Newton–Raphson iterations, fully
  // in-engine. Per iteration the data-sized work is one aggregation
  // of six sufficient statistics (Σw, Σwx, Σwx², Σ(y−p), Σx(y−p), n
  // with w = p(1−p)) — map-side combined, six numbers per partition,
  // the same shuffle shape as a14/a31 — and the 2×2 Newton solve is
  // closed-form Cramer on the driver-free aggregate row. Determinism:
  // x = ln(price) and each iteration's p = σ(β₀+β₁x) are rounded to
  // 6 and frozen as small-width DECIMALs (p in DECIMAL(8,6)), so w,
  // the gradient terms, and all sums are EXACT decimals — the
  // fitted coefficients are bit-identical on any partitioning. The
  // final row also reports training accuracy at the 0.5 threshold
  // (an exact integer count — p and 0.5 compare as decimals).
  // ------------------------------------------------------------------
  private val mlLogregNewton: QFn = (s, dir) => {
    val d0 = t(s, dir, "orders").select(
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("y"),
      round(log(col("o_totalprice")), 6).cast(DecimalType(9, 6)).as("x"))
    val d = d0.localCheckpoint(true)
    val (b0b, b1b) = graft.ml.LogReg.fit(d, iters = 2)
    val p = graft.ml.LogReg.sigmoid(b0b, b1b, col("x"))
    d.select(col("y"), p.as("p"))
      .agg(count(lit(1)).as("n"),
        sum(when((col("p") > lit(0.5).cast(DecimalType(8, 6))) ===
          (col("y") === 1), 1L).otherwise(0L)).as("n_correct"))
      .select(col("n"), col("n_correct"),
        lit(b0b.doubleValue()).as("b0_r"), lit(b1b.doubleValue()).as("b1_r"),
        round(col("n_correct").cast("double") / col("n").cast("double"), 6)
          .as("accuracy_r"))
  }
  /** The oracle replays the two Newton steps as chained CTEs — the
    * coefficient pair after each step is recomputed inside SQL, so the
    * oracle is self-contained (no values smuggled from the Scala side).
    */
  private val mlLogregNewtonSql = {
    s"""WITH d AS (SELECT
       |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END AS y,
       |    CAST(round(ln(o_totalprice), 6) AS DECIMAL(9,6)) AS x
       |  FROM orders),
       |${graft.ml.LogReg.sqlSteps(2)},
       |fp AS (SELECT d.y,
       |    CAST(round(1.0 / (1.0 + exp(-CAST(CAST(bb.b0 + bb.b1 * d.x
       |      AS VARCHAR) AS DOUBLE))), 6) AS DECIMAL(8,6)) AS p,
       |    bb.b0, bb.b1
       |  FROM d CROSS JOIN bb)
       |SELECT COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN (p > CAST(0.5 AS DECIMAL(8,6))) = (y = 1)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(CAST(MAX(b0) AS VARCHAR) AS DOUBLE) AS b0_r,
       |  CAST(CAST(MAX(b1) AS VARCHAR) AS DOUBLE) AS b1_r,
       |  round(CAST(SUM(CASE WHEN (p > CAST(0.5 AS DECIMAL(8,6))) = (y = 1)
       |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS accuracy_r
       |FROM fp""".stripMargin
  }

  // ------------------------------------------------------------------
  // q30_price_elasticity — per-brand log-log demand curve: the OLS
  // slope of ln(quantity) on ln(unit price) IS the price elasticity
  // of demand. One broadcast dim join tags each lineitem with its
  // brand; both logs are rounded once and frozen as DECIMAL(9,6), so
  // the five per-brand sufficient statistics are exact decimal sums
  // (map-side combined, 25 groups) and slope/intercept are one
  // rounded double each — the a14 shape applied to the economics
  // question every retail warehouse asks.
  // ------------------------------------------------------------------
  private val q30PriceElasticity: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_partkey"),
      round(log(col("l_extendedprice") / col("l_quantity")), 6)
        .cast(DecimalType(9, 6)).as("x"),
      round(log(col("l_quantity")), 6).cast(DecimalType(9, 6)).as("y"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val m = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    val n = col("n"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    m.select(col("p_brand"), n,
        round(slope, 6).as("elasticity_r"),
        round((sy - slope * sx) / n, 6).as("intercept_r"))
      .orderBy("p_brand")
  }
  private val q30PriceElasticitySql =
    """WITH li AS (SELECT l_partkey,
      |    CAST(round(ln(l_extendedprice / l_quantity), 6) AS DECIMAL(9,6))
      |      AS x,
      |    CAST(round(ln(l_quantity), 6) AS DECIMAL(9,6)) AS y
      |  FROM lineitem),
      |m AS (SELECT p.p_brand, COUNT(*) AS n,
      |    SUM(li.x) AS sx, SUM(li.y) AS sy,
      |    SUM(li.x * li.x) AS sxx, SUM(li.x * li.y) AS sxy
      |  FROM li JOIN part p ON li.l_partkey = p.p_partkey
      |  GROUP BY 1),
      |d AS (SELECT p_brand, n,
      |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM m)
      |SELECT p_brand, n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
      |    AS elasticity_r,
      |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
      |    AS intercept_r
      |FROM d ORDER BY p_brand""".stripMargin

  // ------------------------------------------------------------------
  // a36_median_ci — distribution-free 95% confidence interval for the
  // per-language median document length, from order-statistic ranks:
  // P(X(l) ≤ median ≤ X(u)) ≥ 0.95 with l = ⌊(n − 1.96√n)/2⌋ and
  // u = ⌈1 + (n + 1.96√n)/2⌉ (the binomial/normal rank bound — no
  // resampling, no replicas, one extra histogram pass; compare
  // a30's 64-replicate bootstrap for the mean). n_chars has a
  // bounded domain, so the rank lookups run on the per-language
  // value histogram via a cumulative-count window — never a global
  // sort of the documents. Ranks are exact BIGINTs born from one
  // double expression; the median itself is `percentile` ≡
  // `quantile_cont` (parity pinned by a_percentiles).
  // ------------------------------------------------------------------
  private val a36MedianCi: QFn = (s, dir) => {
    val d = t(s, dir, "documents").select(col("lang"), col("n_chars"))
    val med = d.groupBy("lang").agg(count(lit(1)).as("n"),
      expr("percentile(n_chars, 0.5)").as("med"))
      .select(col("lang"), col("n"), round(col("med"), 6).as("med_r"),
        floor((col("n").cast("double") -
          lit(1.959964) * sqrt(col("n").cast("double"))) / 2.0)
          .cast("long").as("lrank"),
        ceil(lit(1.0) + (col("n").cast("double") +
          lit(1.959964) * sqrt(col("n").cast("double"))) / 2.0)
          .cast("long").as("urank"))
    val hist = d.groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    hist.join(broadcast(med), "lang")
      .groupBy("lang", "n", "med_r", "lrank", "urank")
      .agg(min(when(col("cum") >= col("lrank"), col("n_chars"))).as("ci_lo"),
        min(when(col("cum") >= col("urank"), col("n_chars"))).as("ci_hi"))
      .select(col("lang"), col("n"), col("med_r"), col("ci_lo"), col("ci_hi"))
      .orderBy("lang")
  }
  private val a36MedianCiSql =
    """WITH d AS (SELECT lang, n_chars FROM documents),
      |med AS (SELECT lang, COUNT(*) AS n,
      |    round(quantile_cont(n_chars, 0.5), 6) AS med_r,
      |    CAST(floor((CAST(COUNT(*) AS DOUBLE)
      |      - 1.959964 * sqrt(CAST(COUNT(*) AS DOUBLE))) / 2.0) AS BIGINT)
      |      AS lrank,
      |    CAST(ceil(1.0 + (CAST(COUNT(*) AS DOUBLE)
      |      + 1.959964 * sqrt(CAST(COUNT(*) AS DOUBLE))) / 2.0) AS BIGINT)
      |      AS urank
      |  FROM d GROUP BY 1),
      |hist AS (SELECT lang, n_chars, COUNT(*) AS c,
      |    SUM(COUNT(*)) OVER (PARTITION BY lang ORDER BY n_chars) AS cum
      |  FROM d GROUP BY 1, 2)
      |SELECT h.lang, med.n, med.med_r,
      |  MIN(CASE WHEN h.cum >= med.lrank THEN h.n_chars END) AS ci_lo,
      |  MIN(CASE WHEN h.cum >= med.urank THEN h.n_chars END) AS ci_hi
      |FROM hist h JOIN med USING (lang)
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ml_logreg_newton" -> mlLogregNewton,
    "q30_price_elasticity" -> q30PriceElasticity,
    "a36_median_ci" -> a36MedianCi)

  val oracleSql: Map[String, String] = Map(
    "ml_logreg_newton" -> mlLogregNewtonSql,
    "q30_price_elasticity" -> q30PriceElasticitySql,
    "a36_median_ci" -> a36MedianCiSql)
}
