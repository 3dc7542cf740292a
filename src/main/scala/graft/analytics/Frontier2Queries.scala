package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 sixth-session widening: nonparametric inference
  * (Mann–Whitney U with tie correction), scalable uncertainty
  * quantification (Poisson bootstrap — the single-pass bootstrap used
  * at web scale), forecast backtesting (seasonal-naive + MAPE), graph
  * local clustering coefficients, a differential-privacy-shaped noisy
  * release, and the corpus "dataset card" summary an LLM data
  * pipeline publishes next to every training mix.
  *
  * Determinism follows the house rules (SURVEY §11): exact
  * integer/decimal arithmetic end-to-end, every double born as ONE
  * expression over exact inputs and rounded to 6 before any
  * reordering sum (round-6 terms that must be summed are frozen as
  * DECIMAL(18,6) first), md5-derived uniforms for anything sampled,
  * and a total ORDER BY on every result.
  */
object Frontier2Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // a29_mann_whitney — Mann–Whitney U rank-sum test (en vs es doc
  // lengths) with the tie-corrected normal approximation. The combined
  // ranking is NEVER materialized per row: n_chars has a bounded
  // domain (≤ ~550 distinct values), so the rank structure lives in a
  // value histogram — per value v, the count below it (cless) gives
  // every tied member the average rank (cless + (t+1)/2). Doubling
  // that (r2x = Σ n1v·(2·cless + t + 1) = 2·R1) keeps the whole rank
  // sum in BIGINT; U, the tie term Σ(t³−t), and both test statistics
  // derive from those exact integers in one rounded double each. The
  // only window runs over the ≤550-row histogram (domain-bounded), so
  // the plan at 10¹⁰ docs is: one groupBy shuffle on the value key +
  // a centimeter of driver-free window.
  // ------------------------------------------------------------------
  private val a29MannWhitney: QFn = (s, dir) => {
    val d = t(s, dir, "documents")
      .filter(col("lang").isin("en", "es"))
      .select(col("lang"), col("n_chars"))
    val hist = d.groupBy("n_chars").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n1v"),
      count(lit(1)).as("ntv"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cless",
      coalesce(sum(col("ntv")).over(w), lit(0L)))
    val a = cum.agg(
      sum(col("n1v")).as("n1"),
      sum(col("ntv") - col("n1v")).as("n2"),
      sum(col("n1v") * (lit(2L) * col("cless") + col("ntv") + lit(1L)))
        .as("r2x"),
      sum(col("ntv") * col("ntv") * col("ntv") - col("ntv")).as("tiesum"))
    val u2x = col("r2x") - col("n1") * (col("n1") + 1)
    a.select(
      col("n1"), col("n2"),
      (u2x.cast("double") / lit(2.0)).as("u1"),
      round(
        ((u2x.cast("double") / lit(2.0)) -
          col("n1").cast("double") * col("n2").cast("double") / lit(2.0)) /
          sqrt(col("n1").cast("double") * col("n2").cast("double") / lit(12.0) *
            ((col("n1") + col("n2") + 1).cast("double") -
              col("tiesum").cast("double") /
                ((col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2") - 1).cast("double")))), 6).as("z_r"),
      round(lit(1.0) -
        u2x.cast("double") / (col("n1") * col("n2")).cast("double"), 6)
        .as("rbc_r"))
  }
  private val a29Sql =
    """WITH d AS (SELECT lang, n_chars FROM documents
      |           WHERE lang IN ('en', 'es')),
      |h AS (SELECT n_chars,
      |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n1v,
      |        COUNT(*) AS ntv
      |      FROM d GROUP BY 1),
      |c AS (SELECT n_chars, n1v, ntv,
      |        COALESCE(SUM(ntv) OVER (ORDER BY n_chars
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cless
      |      FROM h),
      |a AS (SELECT SUM(n1v) AS n1, SUM(ntv - n1v) AS n2,
      |        SUM(n1v * (2 * cless + ntv + 1)) AS r2x,
      |        SUM(ntv * ntv * ntv - ntv) AS tiesum
      |      FROM c)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
      |  round(((CAST(r2x - n1 * (n1 + 1) AS DOUBLE) / 2.0)
      |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
      |      * (CAST(n1 + n2 + 1 AS DOUBLE)
      |        - CAST(tiesum AS DOUBLE)
      |          / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))),
      |    6) AS z_r,
      |  round(1.0 - CAST(r2x - n1 * (n1 + 1) AS DOUBLE)
      |    / CAST(n1 * n2 AS DOUBLE), 6) AS rbc_r
      |FROM a""".stripMargin

  // ------------------------------------------------------------------
  // a30_poisson_bootstrap — bootstrap CI for the mean order price via
  // the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
  // for Massive Data Streams", Google 2012): instead of resampling n
  // rows with replacement (which needs global coordination), each row
  // independently draws its multiplicity c ~ Poisson(1) per replicate
  // from a salted md5 uniform, so all 64 replicates stream out of ONE
  // scan with map-side partial aggregation — the shuffle carries 64
  // rows per partition, never the data. Replicate means are exact
  // DECIMAL sums ÷ BIGINT counts (one rounded double each); the 95%
  // interval is the 2nd / 63rd order statistic of the 64 replicate
  // means (a 64-row window — bounded by the replicate count, not the
  // data). u = (h13+1)/2^52 is an exact ≤2^52 integer over a power of
  // two; the Poisson(1) inverse-CDF thresholds are fixed double
  // literals, so both engines bucket identically.
  // ------------------------------------------------------------------
  private val pbThresholds = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)
  private val a30PoissonBootstrap: QFn = (s, dir) => {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
    val reps = o.withColumn("rep", explode(sequence(lit(0), lit(63))))
    val h13 = conv(substring(md5(concat(lit("pb:"),
      col("rep").cast("string"), lit(":"),
      col("o_orderkey").cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h13 + lit(1L)).cast("double") / lit(4.503599627370496e15)
    val c = pbThresholds.zipWithIndex
      .foldLeft(when(u < pbThresholds.head, 0L)) { case (acc, (th, i)) =>
        if (i == 0) acc else acc.when(u < th, i.toLong)
      }.otherwise(7L)
    val repMeans = reps.withColumn("c", c)
      .groupBy("rep")
      .agg(sum(col("p") * col("c")).as("sdec"), sum(col("c")).as("n"))
      .select(col("rep"), round(
        col("sdec").cast("double") / col("n").cast("double"), 6).as("m_r"))
    val ranked = repMeans.withColumn("rk",
      row_number().over(Window.orderBy(col("m_r"), col("rep"))))
    val ci = ranked.agg(
      count(lit(1)).as("n_reps"),
      max(when(col("rk") === 2, col("m_r"))).as("ci_lo_r"),
      max(when(col("rk") === 63, col("m_r"))).as("ci_hi_r"))
    val est = o.agg(round(
      sum(col("p")).cast("double") / count(lit(1)).cast("double"), 6)
      .as("est_mean_r"))
    est.crossJoin(broadcast(ci))
      .select(col("n_reps"), col("est_mean_r"), col("ci_lo_r"), col("ci_hi_r"))
  }
  private val a30Sql = {
    val cdf = pbThresholds.zipWithIndex
      .map { case (th, i) => s"WHEN u < $th THEN $i" }.mkString(" ")
    s"""WITH o AS (SELECT o_orderkey,
       |             CAST(o_totalprice AS DECIMAL(12,2)) AS p FROM orders),
       |r AS (SELECT o.o_orderkey, o.p, t.rep,
       |        (CAST(('0x' || substring(md5('pb:' || CAST(t.rep AS VARCHAR)
       |           || ':' || CAST(o.o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT)
       |         + 1) / 4503599627370496.0 AS u
       |      FROM o CROSS JOIN range(0, 64) t(rep)),
       |m AS (SELECT rep,
       |        round(CAST(CAST(SUM(p * c) AS VARCHAR) AS DOUBLE)
       |          / CAST(SUM(c) AS DOUBLE), 6) AS m_r
       |      FROM (SELECT rep, p, CASE $cdf ELSE 7 END AS c FROM r)
       |      GROUP BY 1),
       |rk AS (SELECT rep, m_r,
       |         row_number() OVER (ORDER BY m_r, rep) AS rk FROM m),
       |ci AS (SELECT COUNT(*) AS n_reps,
       |         MAX(CASE WHEN rk = 2 THEN m_r END) AS ci_lo_r,
       |         MAX(CASE WHEN rk = 63 THEN m_r END) AS ci_hi_r FROM rk),
       |est AS (SELECT round(CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE)
       |          / CAST(COUNT(*) AS DOUBLE), 6) AS est_mean_r FROM o)
       |SELECT n_reps, est_mean_r, ci_lo_r, ci_hi_r
       |FROM est CROSS JOIN ci""".stripMargin
  }

  // ------------------------------------------------------------------
  // q28_seasonal_backtest — forecast backtesting: the seasonal-naive
  // model (forecast(m) = actual(m − 12 months)) scored by MAPE per
  // backtest year. Monthly revenue is an exact DECIMAL sum; the
  // forecast join is a self-join on (year+1, month) — calendar-
  // bounded, ~80 rows; each month's absolute percentage error is one
  // rounded double frozen to DECIMAL(18,6) so the per-year mean is an
  // exact decimal sum (no unordered double accumulation). This is the
  // evaluation loop every demand-forecasting pipeline runs before
  // promoting a model — expressed as two shuffles on keys that scale
  // with the calendar, not the fact table.
  // ------------------------------------------------------------------
  private val q28SeasonalBacktest: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
      .groupBy("yr", "mo").agg(sum(col("p")).as("rev"))
    val prev = m.select((col("yr") + 1).as("yr"), col("mo"),
      col("rev").as("rev_prev"))
    val bt = m.join(prev, Seq("yr", "mo"))
      .withColumn("ape_d",
        round(abs(col("rev") - col("rev_prev")).cast("double") /
          col("rev").cast("double"), 6).cast(DecimalType(18, 6)))
    bt.groupBy("yr")
      .agg(count(lit(1)).as("n_months"), sum(col("ape_d")).as("sape"))
      .select(col("yr"), col("n_months"),
        round(col("sape").cast("double") / col("n_months").cast("double"), 6)
          .as("mape_r"))
      .orderBy("yr")
  }
  private val q28Sql =
    """WITH m AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |             CAST(month(o_orderdate) AS INT) AS mo,
      |             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      |           FROM orders GROUP BY 1, 2),
      |bt AS (SELECT a.yr, a.mo,
      |         CAST(round(CAST(abs(a.rev - b.rev) AS DOUBLE)
      |           / CAST(a.rev AS DOUBLE), 6) AS DECIMAL(18,6)) AS ape_d
      |       FROM m a JOIN m b ON a.yr = b.yr + 1 AND a.mo = b.mo)
      |SELECT yr, COUNT(*) AS n_months,
      |  round(CAST(SUM(ape_d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS mape_r
      |FROM bt GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // g_clustering_coeff — per-node local clustering coefficient over
  // the co-purchase graph (same edge rule as g_triangle_count: part
  // pairs sharing ≥2 orders). Triangle membership comes from the
  // degree-ordered oriented enumeration (operators/Triangles) — each
  // triangle emitted once, exploded to its three corners, tallied by
  // one groupBy — so the wedge work stays O(m^1.5) and no node's
  // neighborhood is ever self-joined. cc = 2·tri/(deg·(deg−1)) is one
  // rounded double from exact integers.
  // ------------------------------------------------------------------
  private val gClusteringCoeff: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val edges = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
      .select(col("pa").as("ea"), col("pb").as("eb"))
    graft.operators.Triangles.localClustering(edges, "ea", "eb")
      .orderBy("node")
  }
  private val gClusteringSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS ea, b.l_partkey AS eb
      |      FROM op a JOIN op b USING (l_orderkey)
      |      WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |        (SELECT ea AS node FROM e UNION ALL SELECT eb FROM e) GROUP BY 1),
      |o AS (SELECT CASE WHEN (da.deg, e.ea) < (db.deg, e.eb) THEN e.ea ELSE e.eb END AS s,
      |             CASE WHEN (da.deg, e.ea) < (db.deg, e.eb) THEN e.eb ELSE e.ea END AS t,
      |             CASE WHEN (da.deg, e.ea) < (db.deg, e.eb) THEN db.deg ELSE da.deg END AS dt
      |      FROM e JOIN deg da ON da.node = e.ea JOIN deg db ON db.node = e.eb),
      |tri AS (SELECT x.s AS v1, x.t AS v2, y.t AS v3
      |        FROM o x JOIN o y ON x.s = y.s AND ((x.dt, x.t) < (y.dt, y.t))
      |        JOIN o z ON z.s = x.t AND z.t = y.t),
      |nt AS (SELECT node, COUNT(*) AS tri_n FROM
      |       (SELECT v1 AS node FROM tri UNION ALL SELECT v2 FROM tri
      |        UNION ALL SELECT v3 FROM tri) GROUP BY 1)
      |SELECT d.node, d.deg, COALESCE(nt.tri_n, 0) AS tri_n,
      |  round((2.0 * CAST(COALESCE(nt.tri_n, 0) AS DOUBLE))
      |    / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE)), 6) AS cc_r
      |FROM deg d LEFT JOIN nt USING (node)
      |WHERE d.deg >= 2 ORDER BY d.node""".stripMargin

  // ------------------------------------------------------------------
  // x8_dp_noisy_count — differential-privacy-SHAPED release: per-
  // nation customer counts with Laplace(b = 1/ε, ε = 1) noise via the
  // inverse CDF (−b·sign(u−½)·ln(1−2|u−½|)). The "noise" is drawn
  // from a salted md5 uniform on the release key so the entry is
  // byte-reproducible for the oracle — a production release would use
  // a secret seed; the mechanism, sensitivity-1 count shape, and
  // calibrated scale are the real thing (Dwork et al., TCC'06).
  // Extends §2.10 beyond masking/k-anonymity to noise-based
  // disclosure control. One broadcast-sized groupBy; noise is one
  // rounded double per output row.
  // ------------------------------------------------------------------
  private val x8DpNoisyCount: QFn = (s, dir) => {
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val c = t(s, dir, "customer")
      .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
    val h13 = conv(substring(md5(concat(lit("dp:"), col("n_name"))),
      1, 13), 16, 10).cast("long")
    val u = (h13 + lit(1L)).cast("double") / lit(4.503599627370496e15)
    val uc = u - lit(0.5)
    val noise = when(uc < 0, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(uc))
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(col("n_name"),
        round(col("cnt").cast("double") + round(noise, 6), 6)
          .as("noisy_count_r"))
      .orderBy("n_name")
  }
  private val x8Sql =
    """WITH c AS (SELECT c_nationkey, COUNT(*) AS cnt
      |           FROM customer GROUP BY 1),
      |u AS (SELECT n.n_name, COALESCE(c.cnt, 0) AS cnt,
      |        (CAST(('0x' || substring(md5('dp:' || n.n_name), 1, 13))
      |           AS BIGINT) + 1) / 4503599627370496.0 - 0.5 AS uc
      |      FROM nation n LEFT JOIN c ON c.c_nationkey = n.n_nationkey)
      |SELECT n_name,
      |  round(CAST(cnt AS DOUBLE)
      |    + round((CASE WHEN uc < 0 THEN 1.0 ELSE -1.0 END)
      |        * ln(1.0 - 2.0 * abs(uc)), 6), 6) AS noisy_count_r
      |FROM u ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------------
  // pipe_dataset_card — the per-language dataset-card block an LLM
  // training mix publishes: document / source counts, token totals
  // and corpus share, exact-duplicate rate (corpus-wide normalized
  // sha2, counted once and joined back), median and mean lengths.
  // One corpus scan feeds both the hash histogram and the per-lang
  // rollup; the corpus token total is a 1-row broadcast. All counts
  // exact; the two ratios are one rounded double each; the median is
  // Spark `percentile` ≡ DuckDB `quantile_cont` (parity pinned by
  // a_percentiles/b2).
  // ------------------------------------------------------------------
  private val pipeDatasetCard: QFn = (s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      col("source"), col("n_chars"),
      TF.wsTokenCount(col("text")).cast("long").as("toks"),
      sha2(TF.normText(col("text")), 256).as("h"))
    val hc = d.groupBy("h").agg(count(lit(1)).as("hc"))
    val perLang = d.join(hc, "h").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("toks")).as("tokens_total"),
      sum(when(col("hc") > 1, 1L).otherwise(0L)).as("dup_docs"),
      expr("percentile(n_chars, 0.5)").as("p50_chars"),
      sum(col("n_chars")).as("sum_chars"))
    val tot = perLang.agg(sum(col("tokens_total")).as("corpus_tokens"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        col("tokens_total"), col("dup_docs"), col("p50_chars"),
        round(col("sum_chars").cast("double") / col("n_docs").cast("double"),
          6).as("avg_chars_r"),
        round(col("tokens_total").cast("double") /
          col("corpus_tokens").cast("double"), 6).as("token_share_r"))
      .orderBy("lang")
  }
  private val pipeDatasetCardSql = {
    val toks = TF.wsTokenCountSql("text")
    val norm = TF.normTextSql("text")
    s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
       |             CAST($toks AS BIGINT) AS toks,
       |             sha256($norm) AS h
       |           FROM documents),
       |hc AS (SELECT h, COUNT(*) AS hc FROM d GROUP BY 1),
       |pl AS (SELECT lang, COUNT(*) AS n_docs,
       |         COUNT(DISTINCT source) AS n_sources,
       |         CAST(SUM(toks) AS BIGINT) AS tokens_total,
       |         CAST(SUM(CASE WHEN hc.hc > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS dup_docs,
       |         quantile_cont(n_chars, 0.5) AS p50_chars,
       |         SUM(n_chars) AS sum_chars
       |       FROM d JOIN hc USING (h) GROUP BY 1),
       |tot AS (SELECT SUM(tokens_total) AS corpus_tokens FROM pl)
       |SELECT lang, n_docs, n_sources, tokens_total, dup_docs, p50_chars,
       |  round(CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS avg_chars_r,
       |  round(CAST(tokens_total AS DOUBLE) / CAST(corpus_tokens AS DOUBLE),
       |    6) AS token_share_r
       |FROM pl CROSS JOIN tot ORDER BY lang""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "a29_mann_whitney" -> a29MannWhitney,
    "a30_poisson_bootstrap" -> a30PoissonBootstrap,
    "q28_seasonal_backtest" -> q28SeasonalBacktest,
    "g_clustering_coeff" -> gClusteringCoeff,
    "x8_dp_noisy_count" -> x8DpNoisyCount,
    "pipe_dataset_card" -> pipeDatasetCard)

  val oracleSql: Map[String, String] = Map(
    "a29_mann_whitney" -> a29Sql,
    "a30_poisson_bootstrap" -> a30Sql,
    "q28_seasonal_backtest" -> q28Sql,
    "g_clustering_coeff" -> gClusteringSql,
    "x8_dp_noisy_count" -> x8Sql,
    "pipe_dataset_card" -> pipeDatasetCardSql)
}
