package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, eighth pack: next-event prediction evaluation
  * (fit the transition model on HELD-IN users, score top-1 accuracy
  * on held-out users — the behavioral-model counterpart of
  * t_perplexity_eval's text split), Gumbel tail fitting on block
  * maxima (extreme-value theory's method-of-moments estimate — the
  * tail-risk number a capacity planner asks for), and per-source
  * lexical statistics (type-token ratio, hapax share, mean word
  * length — the vocabulary-health panel of every corpus report).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier20Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // ev_next_event_eval — honest evaluation of a first-order next-
  // event predictor: transition counts fit on EVEN user_ids only,
  // the predictor for context a is argmax_b count(a→b) (ties broken
  // alphabetically — a total, engine-agreed order), and top-1
  // accuracy is scored on ODD users' transitions. The model table is
  // 5×5; the eval pass is one lead() per user partition + a
  // broadcast join against the argmax table — at any scale the data
  // moves once. The baseline column (global majority class among
  // train TARGETS) pins how much the context actually buys — an
  // accuracy number without its baseline is marketing, not
  // measurement.
  // ------------------------------------------------------------------
  private val evNextEventEval: QFn = (s, dir) => {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val trans = e.withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"), col("event_type").as("a"),
        col("nxt").as("b"))
      .localCheckpoint(true)
    val train = trans.filter(col("user_id") % 2 === 0)
    val fit = train.groupBy("a", "b").agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy("a")
      .orderBy(col("n").desc, col("b").asc)
    val model = fit.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("a"), col("b").as("pred"))
    val majority = train.groupBy(col("b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("b").asc).limit(1)
      .select(col("b").as("maj"))
    val eval_ = trans.filter(col("user_id") % 2 === 1)
      .join(broadcast(model), Seq("a"), "left")
      .crossJoin(broadcast(majority))
    eval_.groupBy("a")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("b") === col("pred"), 1L).otherwise(0L))
          .cast("long").as("n_correct"),
        sum(when(col("b") === col("maj"), 1L).otherwise(0L))
          .cast("long").as("n_majority"))
      .select(col("a").as("context"), col("n_eval"), col("n_correct"),
        round(col("n_correct").cast("double") /
          col("n_eval").cast("double"), 6).as("acc_r"),
        col("n_majority"),
        round(col("n_majority").cast("double") /
          col("n_eval").cast("double"), 6).as("baseline_r"))
      .orderBy("context")
  }
  private val evNextEventEvalSql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events),
      |tr AS (SELECT user_id, event_type AS a,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY sec, event_id) AS b
      |  FROM e),
      |trans AS (SELECT user_id, a, b FROM tr WHERE b IS NOT NULL),
      |fit AS (SELECT a, b, COUNT(*) AS n FROM trans
      |  WHERE user_id % 2 = 0 GROUP BY 1, 2),
      |model AS (SELECT a, b AS pred FROM fit
      |  QUALIFY row_number() OVER (PARTITION BY a
      |    ORDER BY n DESC, b) = 1),
      |maj AS (SELECT b AS maj FROM trans WHERE user_id % 2 = 0
      |  GROUP BY 1 ORDER BY COUNT(*) DESC, b LIMIT 1),
      |ev AS (SELECT t.a, t.b, m.pred, maj.maj
      |  FROM trans t LEFT JOIN model m ON m.a = t.a
      |  CROSS JOIN maj
      |  WHERE t.user_id % 2 = 1)
      |SELECT a AS context, COUNT(*) AS n_eval,
      |  CAST(SUM(CASE WHEN b = pred THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  round(CAST(SUM(CASE WHEN b = pred THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS acc_r,
      |  CAST(SUM(CASE WHEN b = maj THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_majority,
      |  round(CAST(SUM(CASE WHEN b = maj THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS baseline_r
      |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // a44_gumbel_tail — extreme-value tail fit on block maxima: the
  // monthly maximum order price is the block-maxima series, and the
  // Gumbel location/scale come from the method of moments —
  // β = s·√6/π, μ = x̄ − γ·β (γ = Euler–Mascheroni) — over exact
  // decimal block stats (n, Σmax, Σmax²). The payoff numbers: the
  // 12-block return level μ − β·ln(−ln(1−1/12)) ("the monthly max
  // you expect to exceed once a year") and P(max > 1.5·x̄) from the
  // Gumbel CDF. Block maxima are one month-key groupBy; the fit runs
  // on the data-scale-invariant block table; every emitted number is
  // ONE rounded double over the exact moments.
  // ------------------------------------------------------------------
  private val a44GumbelTail: QFn = (s, dir) => {
    val blocks = t(s, dir, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mon"))
      .agg(max(col("o_totalprice").cast(DecimalType(18, 4))).as("mx"))
    val st = blocks.agg(count(lit(1)).as("n"),
      sum(col("mx")).cast(DecimalType(38, 4)).as("sx"),
      sum((col("mx") * col("mx")).cast(DecimalType(38, 8)))
        .cast(DecimalType(38, 8)).as("sxx"))
    // moments → Gumbel params — one fixed double expression tree
    val n = col("n").cast("double")
    val mean = col("sx").cast("double") / n
    val variance = (col("sxx").cast("double") - mean * mean * n) / (n - 1)
    val beta = sqrt(variance * lit(6.0)) / lit(math.Pi)
    val gamma = 0.5772156649015329 // Euler–Mascheroni
    val mu = mean - lit(gamma) * beta
    st.select(col("n").as("n_blocks"),
        round(mean, 4).as("block_mean_r"),
        round(beta, 4).as("beta_r"),
        round(mu, 4).as("mu_r"),
        round(mu - beta * log(negate(log(lit(1.0) - lit(1.0 / 12.0)))), 4)
          .as("return_level_12_r"),
        round(lit(1.0) - exp(negate(exp(negate(
          (lit(1.5) * mean - mu) / beta)))), 6).as("p_exceed_150pct_r"))
  }
  private val a44GumbelTailSql =
    """WITH blocks AS (SELECT
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon,
      |    MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS mx
      |  FROM orders GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n0,
      |    CAST(SUM(mx) AS DECIMAL(38,4)) AS sx,
      |    CAST(SUM(CAST(CAST(mx AS DECIMAL(28,4)) * mx AS DECIMAL(38,8)))
      |      AS DECIMAL(38,8)) AS sxx
      |  FROM blocks),
      |d AS (SELECT CAST(n0 AS DOUBLE) AS n, n0,
      |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
      |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd
      |  FROM st)
      |SELECT n0 AS n_blocks,
      |  round(sxd / n, 4) AS block_mean_r,
      |  round(sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1))
      |    * 6.0) / pi(), 4) AS beta_r,
      |  round(sxd / n - 0.5772156649015329
      |    * (sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1)) * 6.0)
      |      / pi()), 4) AS mu_r,
      |  round((sxd / n - 0.5772156649015329
      |    * (sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1)) * 6.0)
      |      / pi()))
      |    - (sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1)) * 6.0)
      |      / pi()) * ln(-ln(1.0 - 1.0 / 12.0)), 4)
      |    AS return_level_12_r,
      |  round(1.0 - exp(-exp(-((1.5 * (sxd / n)
      |    - (sxd / n - 0.5772156649015329
      |      * (sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1)) * 6.0)
      |        / pi())))
      |    / (sqrt(((sxxd - (sxd / n) * (sxd / n) * n) / (n - 1)) * 6.0)
      |      / pi())))), 6) AS p_exceed_150pct_r
      |FROM d""".stripMargin

  // ------------------------------------------------------------------
  // t_lexical_stats — vocabulary-health panel per source: type-token
  // ratio (distinct words / words — low TTR = repetitive boilerplate),
  // hapax share (corpus-wide once-words as a fraction of the source's
  // types — high hapax = noisy OCR/typo tails), and mean word length.
  // Two key-partitioned aggregations (token pass, type pass) plus a
  // corpus-wide hapax table joined on the word key. Every ratio is
  // ONE rounded double over exact counts.
  // ------------------------------------------------------------------
  private val tLexicalStats: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(split(TF.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val types = toks.groupBy("source", "w")
      .agg(count(lit(1)).as("c"), sum(length(col("w"))).as("chars"))
    val hapax = toks.groupBy("w").agg(count(lit(1)).as("gc"))
      .filter(col("gc") === 1).select(col("w"), lit(1L).as("is_hapax"))
    types.join(hapax, Seq("w"), "left")
      .groupBy("source")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("chars")).cast("long").as("n_chars"),
        sum(coalesce(col("is_hapax"), lit(0L))).cast("long")
          .as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr_r"),
        round(col("n_hapax").cast("double") /
          col("n_types").cast("double"), 6).as("hapax_share_r"),
        round(col("n_chars").cast("double") /
          col("n_tokens").cast("double"), 6).as("mean_word_len_r"))
      .orderBy("source")
  }
  private val tLexicalStatsSql = {
    val norm = TF.normTextSql("text")
    s"""WITH tk AS (SELECT source, unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |toks AS (SELECT source, w FROM tk WHERE length(w) > 0),
       |ty AS (SELECT source, w, COUNT(*) AS c,
       |    CAST(SUM(length(w)) AS BIGINT) AS chars
       |  FROM toks GROUP BY 1, 2),
       |hx AS (SELECT w FROM toks GROUP BY w HAVING COUNT(*) = 1)
       |SELECT ty.source,
       |  CAST(SUM(ty.c) AS BIGINT) AS n_tokens,
       |  COUNT(*) AS n_types,
       |  CAST(SUM(CASE WHEN hx.w IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hapax,
       |  round(CAST(COUNT(*) AS DOUBLE)
       |    / CAST(SUM(ty.c) AS DOUBLE), 6) AS ttr_r,
       |  round(CAST(SUM(CASE WHEN hx.w IS NOT NULL THEN 1 ELSE 0 END)
       |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share_r,
       |  round(CAST(SUM(ty.chars) AS DOUBLE)
       |    / CAST(SUM(ty.c) AS DOUBLE), 6) AS mean_word_len_r
       |FROM ty LEFT JOIN hx ON hx.w = ty.w
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "ev_next_event_eval" -> evNextEventEval,
    "a44_gumbel_tail" -> a44GumbelTail,
    "t_lexical_stats" -> tLexicalStats)

  val oracleSql: Map[String, String] = Map(
    "ev_next_event_eval" -> evNextEventEvalSql,
    "a44_gumbel_tail" -> a44GumbelTailSql,
    "t_lexical_stats" -> tLexicalStatsSql)
}
