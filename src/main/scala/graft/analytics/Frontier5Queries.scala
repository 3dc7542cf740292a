package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 ninth-session widening: robust regression (Theil–Sen
  * median-of-slopes over the monthly revenue series), multiple-testing
  * control (per-nation Welch z-tests with Benjamini–Hochberg FDR), and
  * distributed PCA (leading eigenvector of the embedding covariance by
  * power iteration). Statistics that a production analytics/feature
  * platform ships next to plain aggregates — each expressed so the
  * data-sized work is one scan/groupBy and all iteration happens on
  * domain-bounded state (calendar pairs, 25 nations, a 64×64
  * covariance).
  *
  * House determinism rules throughout: exact integer/decimal
  * arithmetic, each double born as ONE expression over exact inputs
  * and rounded to 6 (re-frozen as DECIMAL(18,6) wherever it feeds
  * later arithmetic), and total ORDER BYs.
  */
object Frontier5Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a33_theil_sen — Theil–Sen robust trend over monthly revenue: the
  // slope estimate is the median of all pairwise slopes
  // (rev_j − rev_i)/(t_j − t_i), the intercept the median of
  // rev_i − slope·t_i. Monthly revenue is one exact-decimal groupBy
  // of the fact table; the pairwise stage is a self-join of the
  // MONTHLY series — bounded by the calendar squared (~3.5k pairs),
  // never by the data. Each slope is ONE rounded double from exact
  // decimals; the median uses `percentile` ≡ `quantile_cont` (parity
  // pinned by a_percentiles); the fitted slope is re-frozen as
  // DECIMAL(18,6) so the intercept residuals are exact decimals.
  // The estimator shrugs off the outlier months that wreck the OLS
  // fit (a14/a31) — the robust twin of the regression pack.
  // ------------------------------------------------------------------
  private val a33TheilSen: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1990) * 12 +
        month(col("o_orderdate")) - 1).as("tt"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("rev"))
    val a = m.select(col("tt").as("ti"), col("rev").as("ri"))
    val b = m.select(col("tt").as("tj"), col("rev").as("rj"))
    val slopes = a.join(b, col("ti") < col("tj"))
      .select(round((col("rj") - col("ri")).cast("double") /
        (col("tj") - col("ti")).cast("double"), 6).as("slope_r"))
    val sm = slopes.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope_r, 0.5)").as("slope_m"))
      .select(col("n_pairs"),
        round(col("slope_m"), 6).cast(DecimalType(18, 6)).as("slope_m"))
    val ic = m.crossJoin(broadcast(sm))
      .select(col("n_pairs"), col("slope_m"),
        (col("rev") - col("slope_m") * col("tt")).cast(DecimalType(28, 6))
          .as("b0"))
      .groupBy("n_pairs", "slope_m")
      .agg(count(lit(1)).as("n_months"),
        expr("percentile(b0, 0.5)").as("b0_m"))
    ic.select(col("n_months"), col("n_pairs"),
      col("slope_m").cast("string").cast("double").as("slope_r"),
      round(col("b0_m"), 6).as("intercept_r"))
  }
  private val a33TheilSenSql =
    """WITH m AS (SELECT (CAST(year(o_orderdate) AS INT) - 1990) * 12
      |      + CAST(month(o_orderdate) AS INT) - 1 AS tt,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      |  FROM orders GROUP BY 1),
      |sl AS (SELECT round(CAST(b.rev - a.rev AS DOUBLE)
      |      / CAST(b.tt - a.tt AS DOUBLE), 6) AS slope_r
      |  FROM m a JOIN m b ON a.tt < b.tt),
      |sm AS (SELECT COUNT(*) AS n_pairs,
      |    CAST(round(quantile_cont(slope_r, 0.5), 6) AS DECIMAL(18,6))
      |      AS slope_m
      |  FROM sl),
      |ic AS (SELECT n_pairs, slope_m, COUNT(*) AS n_months,
      |    quantile_cont(CAST(rev - slope_m * tt AS DECIMAL(28,6)), 0.5)
      |      AS b0_m
      |  FROM m CROSS JOIN sm GROUP BY 1, 2)
      |SELECT n_months, n_pairs,
      |  CAST(CAST(slope_m AS VARCHAR) AS DOUBLE) AS slope_r,
      |  round(b0_m, 6) AS intercept_r
      |FROM ic""".stripMargin

  // ------------------------------------------------------------------
  // a34_bh_fdr — 25 simultaneous hypotheses (is a nation's customer
  // balance distribution shifted vs the rest?) with Benjamini–
  // Hochberg false-discovery control. One groupBy produces per-nation
  // exact sums; each complement's sums are the GLOBAL sums minus the
  // nation's (exact decimal subtraction — no second scan). Welch z is
  // one rounded double per nation; the two-sided p-value uses the
  // Abramowitz–Stegun 7.1.26 erf polynomial (max error 1.5e-7),
  // spelled out identically in both engines so the doubles agree
  // bit-for-bit — no libm erf dependency. The BH step-up (reject all
  // p(i) with i ≤ k* = max{k : p(k) ≤ kα/m}, α = 0.10) runs as two
  // windows over the 25-row test table — domain-bounded.
  // ------------------------------------------------------------------
  private val a34BhFdr: QFn = (s, dir) => {
    val per = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n1"),
        sum(col("c_acctbal").cast(DecimalType(12, 2))).as("s1"),
        sum(col("c_acctbal").cast(DecimalType(12, 2)) *
          col("c_acctbal").cast(DecimalType(12, 2))).as("ss1"))
    val glob = per.agg(sum(col("n1")).as("ng"), sum(col("s1")).as("sg"),
      sum(col("ss1")).as("ssg"))
    val j = per.crossJoin(broadcast(glob))
      .join(t(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
    val n1 = col("n1").cast("double")
    val n2 = (col("ng") - col("n1")).cast("double")
    val s1 = col("s1").cast("double")
    val s2 = (col("sg") - col("s1")).cast("double")
    val ss1 = col("ss1").cast("double")
    val ss2 = (col("ssg") - col("ss1")).cast("double")
    val v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    val v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    val z = (s1 / n1 - s2 / n2) / sqrt(v1 / n1 + v2 / n2)
    // two-sided p = 1 - erf(|z|/sqrt(2)), erf via A-S 7.1.26
    val x = abs(col("z_r")) / sqrt(lit(2.0))
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * tt - lit(1.453152027)) * tt +
      lit(1.421413741)) * tt - lit(0.284496736)) * tt + lit(0.254829592)) * tt
    val erf = lit(1.0) - poly * exp(negate(x * x))
    val tests = j.select(col("n_name"), col("n1").as("n_cust"),
        round(z, 6).as("z_r"))
      .withColumn("p_r", round(lit(1.0) - erf, 6))
    val wAll = Window.partitionBy(lit(0))
    val ranked = tests
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("p_r"), col("n_name"))))
      .withColumn("m", count(lit(1)).over(wAll))
    ranked
      .withColumn("kstar", max(when(
        col("p_r") * col("m") <= col("rnk") * 0.10, col("rnk"))
        .otherwise(0)).over(wAll))
      .select(col("n_name"), col("n_cust"), col("z_r"), col("p_r"),
        col("rnk"),
        when(col("rnk") <= col("kstar"), 1).otherwise(0).as("bh_reject"))
      .orderBy("rnk")
  }
  private val a34BhFdrSql =
    """WITH per AS (SELECT c_nationkey, COUNT(*) AS n1,
      |    SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s1,
      |    SUM(CAST(c_acctbal AS DECIMAL(12,2))
      |      * CAST(c_acctbal AS DECIMAL(12,2))) AS ss1
      |  FROM customer GROUP BY 1),
      |gl AS (SELECT SUM(n1) AS ng, SUM(s1) AS sg, SUM(ss1) AS ssg FROM per),
      |d AS (SELECT n.n_name, per.n1 AS n_cust,
      |    CAST(per.n1 AS DOUBLE) AS n1,
      |    CAST(gl.ng - per.n1 AS DOUBLE) AS n2,
      |    CAST(CAST(per.s1 AS VARCHAR) AS DOUBLE) AS s1,
      |    CAST(CAST(gl.sg - per.s1 AS VARCHAR) AS DOUBLE) AS s2,
      |    CAST(CAST(per.ss1 AS VARCHAR) AS DOUBLE) AS ss1,
      |    CAST(CAST(gl.ssg - per.ss1 AS VARCHAR) AS DOUBLE) AS ss2
      |  FROM per CROSS JOIN gl
      |  JOIN nation n ON per.c_nationkey = n.n_nationkey),
      |zt AS (SELECT n_name, n_cust,
      |    round((s1 / n1 - s2 / n2)
      |      / sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
      |           + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2), 6) AS z_r
      |  FROM d),
      |pv AS (SELECT n_name, n_cust, z_r,
      |    round(1.0 - (1.0
      |      - ((((1.061405429 * (1.0 / (1.0 + 0.3275911 * (abs(z_r)
      |            / sqrt(2.0)))) - 1.453152027)
      |          * (1.0 / (1.0 + 0.3275911 * (abs(z_r) / sqrt(2.0))))
      |          + 1.421413741)
      |          * (1.0 / (1.0 + 0.3275911 * (abs(z_r) / sqrt(2.0))))
      |          - 0.284496736)
      |          * (1.0 / (1.0 + 0.3275911 * (abs(z_r) / sqrt(2.0))))
      |          + 0.254829592)
      |        * (1.0 / (1.0 + 0.3275911 * (abs(z_r) / sqrt(2.0))))
      |        * exp(-((abs(z_r) / sqrt(2.0)) * (abs(z_r) / sqrt(2.0))))),
      |      6) AS p_r
      |  FROM zt),
      |rk AS (SELECT n_name, n_cust, z_r, p_r,
      |    CAST(row_number() OVER (ORDER BY p_r, n_name) AS INT) AS rnk,
      |    COUNT(*) OVER () AS m
      |  FROM pv),
      |ks AS (SELECT *, MAX(CASE WHEN p_r * m <= rnk * 0.10 THEN rnk
      |    ELSE 0 END) OVER () AS kstar FROM rk)
      |SELECT n_name, n_cust, z_r, p_r, rnk,
      |  CASE WHEN rnk <= kstar THEN 1 ELSE 0 END AS bh_reject
      |FROM ks ORDER BY rnk""".stripMargin

  // ------------------------------------------------------------------
  // ml_pca_power — leading principal component of the embedding
  // corpus by power iteration. The only data-sized work is the
  // one-pass covariance: explode to (vec, dim, value), self-join on
  // vec_id, groupBy (i, j) — the standard sum-of-outer-products
  // shape whose shuffle carries 64×64 cells per partition after
  // map-side combine. Each covariance cell Σxy/n − x̄ȳ is ONE
  // rounded double frozen as DECIMAL(18,6); the three matvec +
  // renormalize rounds then run entirely on the 4096-row matrix and
  // the 64-row vector (domain-bounded, engine-replayable as chained
  // CTEs). v₀ = 1/8 exactly (= 1/√64, an exact decimal). Rayleigh
  // quotient vᵀ(Cv)/vᵀv reported as the eigenvalue estimate. Sign
  // is pinned by the all-positive start; assignments and rounding
  // make every digit engine-independent.
  // ------------------------------------------------------------------
  private val mlPcaPower: QFn = (s, dir) => {
    val pts = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        round(col("v").cast("double"), 6).cast(DecimalType(18, 6)).as("vd"))
      .localCheckpoint(true)
    val nRows = t(s, dir, "embeddings").agg(count(lit(1)).as("n"))
    val means = pts.groupBy("dim")
      .agg(sum(col("vd")).as("sv"))
      .crossJoin(broadcast(nRows))
      .select(col("dim"),
        round(col("sv").cast("double") / col("n"), 6)
          .cast(DecimalType(18, 6)).as("mu"))
    val a = pts.select(col("vec_id"), col("dim").as("i"), col("vd").as("vi"))
    val b = pts.select(col("vec_id"), col("dim").as("j"), col("vd").as("vj"))
    val cov = a.join(b, "vec_id")
      .groupBy("i", "j").agg(sum(col("vi") * col("vj")).as("sij"))
      .crossJoin(broadcast(nRows))
      .join(broadcast(means.select(col("dim").as("i"), col("mu").as("mi"))),
        "i")
      .join(broadcast(means.select(col("dim").as("j"), col("mu").as("mj"))),
        "j")
      .select(col("i"), col("j"),
        round(col("sij").cast("double") / col("n") -
          col("mi").cast("double") * col("mj").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("c"))
      .localCheckpoint(true)
    var v = means.select(col("dim"),
      lit(0.125).cast(DecimalType(18, 6)).as("vv"))
    def matvec(vc: DataFrame): DataFrame =
      cov.join(broadcast(vc.select(col("dim").as("j"), col("vv"))), "j")
        .groupBy(col("i").as("dim")).agg(sum(col("c") * col("vv")).as("w"))
        .select(col("dim"), round(col("w").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("w_r"))
    (1 to 3).foreach { _ =>
      val w = matvec(v)
      val w6 = col("w_r").cast(DecimalType(12, 6))
      val nrm = w.agg(round(sqrt(sum(w6 * w6).cast("double")), 6)
        .cast(DecimalType(18, 6)).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("dim"),
          round(col("w_r").cast("double") / col("nrm").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("vv"))
      v = v.localCheckpoint(true)
    }
    val u = matvec(v)
    val ray = v.join(u, "dim")
      .agg(sum(col("vv").cast(DecimalType(12, 6)) *
          col("w_r").cast(DecimalType(12, 6))).as("vu"),
        sum(col("vv").cast(DecimalType(12, 6)) *
          col("vv").cast(DecimalType(12, 6))).as("vv2"))
      .select(round(col("vu").cast("double") / col("vv2").cast("double"), 6)
        .as("lambda_r"))
    v.crossJoin(broadcast(ray))
      .select(col("dim"),
        col("vv").cast("string").cast("double").as("v_r"), col("lambda_r"))
      .orderBy("dim")
  }
  private val mlPcaPowerSql = {
    def matvec(vCte: String, n: Int) =
      s"""w$n AS (SELECT cv.i AS dim,
         |    CAST(round(CAST(CAST(SUM(cv.c * $vCte.vv) AS VARCHAR)
         |      AS DOUBLE), 6) AS DECIMAL(18,6)) AS w_r
         |  FROM cov cv JOIN $vCte ON $vCte.dim = cv.j GROUP BY 1)""".stripMargin
    def renorm(n: Int) =
      s"""n$n AS (SELECT CAST(round(sqrt(CAST(CAST(SUM(
         |      CAST(w_r AS DECIMAL(12,6)) * CAST(w_r AS DECIMAL(12,6)))
         |      AS VARCHAR) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS nrm
         |  FROM w$n),
         |v$n AS (SELECT dim, CAST(round(CAST(CAST(w_r AS VARCHAR) AS DOUBLE)
         |      / CAST(CAST(nrm AS VARCHAR) AS DOUBLE), 6) AS DECIMAL(18,6))
         |    AS vv
         |  FROM w$n CROSS JOIN n$n)""".stripMargin
    s"""WITH pts AS (SELECT vec_id, r.i AS dim,
       |    CAST(round(CAST(embedding[r.i + 1] AS DOUBLE), 6)
       |      AS DECIMAL(18,6)) AS vd
       |  FROM embeddings CROSS JOIN range(0, 64) r(i)),
       |nr AS (SELECT COUNT(*) AS n FROM embeddings),
       |mn AS (SELECT dim, CAST(round(CAST(CAST(SUM(vd) AS VARCHAR)
       |      AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS mu
       |  FROM pts CROSS JOIN nr GROUP BY dim, n),
       |cov AS (SELECT a.dim AS i, b.dim AS j,
       |    CAST(round(CAST(CAST(SUM(a.vd * b.vd) AS VARCHAR) AS DOUBLE)
       |        / nr.n
       |      - CAST(CAST(mi.mu AS VARCHAR) AS DOUBLE)
       |        * CAST(CAST(mj.mu AS VARCHAR) AS DOUBLE), 6)
       |      AS DECIMAL(18,6)) AS c
       |  FROM pts a JOIN pts b USING (vec_id) CROSS JOIN nr
       |  JOIN mn mi ON mi.dim = a.dim JOIN mn mj ON mj.dim = b.dim
       |  GROUP BY a.dim, b.dim, nr.n, mi.mu, mj.mu),
       |v0 AS (SELECT dim, CAST(0.125 AS DECIMAL(18,6)) AS vv FROM mn),
       |${matvec("v0", 1)},
       |${renorm(1)},
       |${matvec("v1", 2)},
       |${renorm(2)},
       |${matvec("v2", 3)},
       |${renorm(3)},
       |${matvec("v3", 4)},
       |ray AS (SELECT round(
       |    CAST(CAST(SUM(CAST(v3.vv AS DECIMAL(12,6))
       |        * CAST(w4.w_r AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(SUM(CAST(v3.vv AS DECIMAL(12,6))
       |        * CAST(v3.vv AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE), 6)
       |    AS lambda_r
       |  FROM v3 JOIN w4 USING (dim))
       |SELECT v3.dim, CAST(CAST(v3.vv AS VARCHAR) AS DOUBLE) AS v_r,
       |  ray.lambda_r
       |FROM v3 CROSS JOIN ray ORDER BY v3.dim""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "a33_theil_sen" -> a33TheilSen,
    "a34_bh_fdr" -> a34BhFdr,
    "ml_pca_power" -> mlPcaPower)

  val oracleSql: Map[String, String] = Map(
    "a33_theil_sen" -> a33TheilSenSql,
    "a34_bh_fdr" -> a34BhFdrSql,
    "ml_pca_power" -> mlPcaPowerSql)
}
