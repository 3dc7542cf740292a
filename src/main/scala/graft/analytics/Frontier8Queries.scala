package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 twelfth-session widening: summarization-style evaluation
  * metrics (ROUGE-1/ROUGE-2 F1 over document pairs — the n-gram
  * overlap scorer every generation-eval pipeline runs), rolling
  * cross-series correlation over the daily event volumes (the drift
  * monitor between two KPIs), and fact-to-fact reconciliation (order
  * headers vs line-item rollups — the classic warehouse DQ audit).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs (frozen as
  * DECIMAL(18,6) before any reordering sum), total ORDER BYs.
  */
object Frontier8Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_rouge_pairs — ROUGE-1 and ROUGE-2 F1 between same-language
  // document pairs (doc_id, doc_id+1 — a deterministic, join-derived
  // pairing; no data-sized window). Multiset n-gram overlap is
  // Σ min(count_a, count_b) computed by an inner join on
  // (pair, gram) — everything shuffles on pair/gram keys only, so
  // the evaluation scales to any corpus of (candidate, reference)
  // pairs. Per-pair precision/recall/F1 are ONE rounded double each,
  // frozen as DECIMAL(18,6) so the per-language mean is an exact
  // decimal sum ÷ count. Zero-overlap pairs contribute F1 = 0 (the
  // join drops them; a left join against the pair list restores
  // them), exactly as a generation-eval harness would score them.
  // ------------------------------------------------------------------
  private val tRougePairs: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        split(TF.normText(col("text")), " ").as("toks"))
    val pairs = docs.select(col("doc_id").as("pa"), col("lang"))
      .join(docs.select((col("doc_id") - 1).as("pa"),
        col("lang").as("lang_b"), col("doc_id").as("pb")), "pa")
      .filter(col("lang") === col("lang_b"))
      .select(col("pa"), col("pb"), col("lang"))
      .localCheckpoint(true)
    def grams(n: Int): DataFrame = {
      val base = docs.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
      val g =
        if (n == 1) base.select(col("doc_id"), col("w").as("gram"))
        else {
          val wNext = Window.partitionBy("doc_id").orderBy("pos")
          base.withColumn("w2", lead(col("w"), 1).over(wNext))
            .filter(col("w2").isNotNull)
            .select(col("doc_id"), concat_ws(" ", col("w"), col("w2"))
              .as("gram"))
        }
      g.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    }
    def f1(n: Int, label: String): DataFrame = {
      val gc = grams(n).localCheckpoint(true)
      val lens = gc.groupBy("doc_id").agg(sum("c").as("len"))
      val inter = pairs
        .join(gc.select(col("doc_id").as("pa"), col("gram"),
          col("c").as("ca")), "pa")
        .join(gc.select(col("doc_id").as("pb"), col("gram"),
          col("c").as("cb")), Seq("pb", "gram"))
        .groupBy("pa", "pb").agg(sum(least(col("ca"), col("cb"))).as("ov"))
      pairs
        .join(inter, Seq("pa", "pb"), "left")
        .join(lens.select(col("doc_id").as("pa"), col("len").as("la")), "pa")
        .join(lens.select(col("doc_id").as("pb"), col("len").as("lb")), "pb")
        .select(col("pa"), col("lang"),
          coalesce(
            round(lit(2.0) * col("ov").cast("double") /
              (col("la") + col("lb")).cast("double"), 6),
            lit(0.0)).cast(DecimalType(18, 6)).as(label))
    }
    val r1 = f1(1, "f1_1")
    val r2 = f1(2, "f1_2")
    r1.join(r2.select(col("pa"), col("f1_2")), "pa")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("f1_1")).as("s1"), sum(col("f1_2")).as("s2"))
      .select(col("lang"), col("n_pairs"),
        round(col("s1").cast("double") / col("n_pairs").cast("double"), 6)
          .as("rouge1_f1_r"),
        round(col("s2").cast("double") / col("n_pairs").cast("double"), 6)
          .as("rouge2_f1_r"))
      .orderBy("lang")
  }
  private val tRougePairsSql = {
    val norm = TF.normTextSql("text")
    s"""WITH docs AS (SELECT doc_id, lang,
       |    string_split($norm, ' ') AS toks
       |  FROM documents),
       |pairs AS (SELECT a.doc_id AS pa, b.doc_id AS pb, a.lang
       |  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
       |   AND b.lang = a.lang),
       |w0 AS (SELECT doc_id, unnest(toks) AS w,
       |    generate_subscripts(toks, 1) AS pos
       |  FROM docs),
       |w AS (SELECT doc_id, w, pos FROM w0 WHERE length(w) > 0),
       |g1 AS (SELECT doc_id, w AS gram, COUNT(*) AS c
       |       FROM w GROUP BY 1, 2),
       |b0 AS (SELECT doc_id, w,
       |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM w),
       |g2 AS (SELECT doc_id, w || ' ' || w2 AS gram, COUNT(*) AS c
       |       FROM b0 WHERE w2 IS NOT NULL GROUP BY 1, 2),
       |l1 AS (SELECT doc_id, SUM(c) AS len FROM g1 GROUP BY 1),
       |l2 AS (SELECT doc_id, SUM(c) AS len FROM g2 GROUP BY 1),
       |i1 AS (SELECT p.pa, p.pb, SUM(least(a.c, b.c)) AS ov
       |  FROM pairs p JOIN g1 a ON a.doc_id = p.pa
       |  JOIN g1 b ON b.doc_id = p.pb AND b.gram = a.gram
       |  GROUP BY 1, 2),
       |i2 AS (SELECT p.pa, p.pb, SUM(least(a.c, b.c)) AS ov
       |  FROM pairs p JOIN g2 a ON a.doc_id = p.pa
       |  JOIN g2 b ON b.doc_id = p.pb AND b.gram = a.gram
       |  GROUP BY 1, 2),
       |pf AS (SELECT p.lang,
       |    CAST(COALESCE(round(2.0 * CAST(i1.ov AS DOUBLE)
       |      / CAST(la1.len + lb1.len AS DOUBLE), 6), 0.0)
       |      AS DECIMAL(18,6)) AS f1_1,
       |    CAST(COALESCE(round(2.0 * CAST(i2.ov AS DOUBLE)
       |      / CAST(la2.len + lb2.len AS DOUBLE), 6), 0.0)
       |      AS DECIMAL(18,6)) AS f1_2
       |  FROM pairs p
       |  LEFT JOIN i1 ON i1.pa = p.pa AND i1.pb = p.pb
       |  JOIN l1 la1 ON la1.doc_id = p.pa
       |  JOIN l1 lb1 ON lb1.doc_id = p.pb
       |  LEFT JOIN i2 ON i2.pa = p.pa AND i2.pb = p.pb
       |  JOIN l2 la2 ON la2.doc_id = p.pa
       |  JOIN l2 lb2 ON lb2.doc_id = p.pb)
       |SELECT lang, COUNT(*) AS n_pairs,
       |  round(CAST(CAST(SUM(f1_1) AS VARCHAR) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS rouge1_f1_r,
       |  round(CAST(CAST(SUM(f1_2) AS VARCHAR) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS rouge2_f1_r
       |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // w21_rolling_corr — 7-day rolling Pearson correlation between the
  // daily click and purchase volumes: the KPI co-movement monitor.
  // The event scan collapses to one daily two-column rollup
  // (conditional counts — exact integers); the rolling sufficient
  // statistics (Σx, Σy, Σx², Σy², Σxy over the trailing 7 days) are
  // exact integer window sums over the CALENDAR-bounded series, and
  // each day's correlation is ONE rounded double (NULL until the
  // window fills or when either series is locally constant).
  // ------------------------------------------------------------------
  private val w21RollingCorr: QFn = (s, dir) => {
    val daily = t(s, dir, "events")
      .select(to_date(Tables.eventTs("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val w7 = Window.orderBy("d").rowsBetween(-6, 0)
    val cum = daily
      .withColumn("k", count(lit(1)).over(w7))
      .withColumn("sx", sum(col("x")).over(w7))
      .withColumn("sy", sum(col("y")).over(w7))
      .withColumn("sxx", sum(col("x") * col("x")).over(w7))
      .withColumn("syy", sum(col("y") * col("y")).over(w7))
      .withColumn("sxy", sum(col("x") * col("y")).over(w7))
    val k = col("k").cast("double")
    val num = k * col("sxy") - col("sx") * col("sy")
    val den = sqrt(k * col("sxx") - col("sx") * col("sx")) *
      sqrt(k * col("syy") - col("sy") * col("sy"))
    cum.select(col("d"), col("x"), col("y"),
        when(col("k") === 7, round(num / nullif(den, lit(0.0)), 6))
          .as("corr7_r"))
      .orderBy("d")
  }
  private val w21RollingCorrSql =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |c AS (SELECT d, x, y,
      |    COUNT(*) OVER w7 AS k,
      |    SUM(x) OVER w7 AS sx, SUM(y) OVER w7 AS sy,
      |    SUM(x * x) OVER w7 AS sxx, SUM(y * y) OVER w7 AS syy,
      |    SUM(x * y) OVER w7 AS sxy
      |  FROM daily
      |  WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT d, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
      |  CASE WHEN k = 7 THEN round(
      |    (CAST(k AS DOUBLE) * sxy - sx * sy)
      |    / NULLIF(sqrt(CAST(k AS DOUBLE) * sxx - sx * sx)
      |           * sqrt(CAST(k AS DOUBLE) * syy - sy * sy), 0.0), 6)
      |  END AS corr7_r
      |FROM c ORDER BY d""".stripMargin

  // ------------------------------------------------------------------
  // dq_reconciliation — fact-to-fact reconciliation: does each order
  // header's total match its line items' Σ extendedprice·(1−discount)
  // ·(1+tax)? The warehouse audit that catches silent ETL drift
  // between grains. One groupBy rolls lineitem up to the order grain
  // in exact DECIMAL; the relative gap per order is ONE rounded
  // double, bucketed into an audit histogram (match ≤0.01%, minor
  // ≤1%, major >1%, missing lines) — bounded output, exact counts,
  // plus the summed absolute gap per bucket for materiality.
  // ------------------------------------------------------------------
  private val dqReconciliation: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum((col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1).cast(DecimalType(8, 6)) -
          col("l_discount").cast(DecimalType(8, 6))) *
        (lit(1).cast(DecimalType(8, 6)) +
          col("l_tax").cast(DecimalType(8, 6))))
        .cast(DecimalType(18, 6))).as("li_total"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("hdr_total"))
    val gap = o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
      .select(col("o_orderkey"), col("hdr_total"), col("li_total"),
        when(col("li_total").isNull, lit(null))
          .otherwise(round(abs(col("li_total") - col("hdr_total"))
            .cast("double") / col("hdr_total").cast("double"), 6))
          .as("rel_gap_r"))
    gap.select(
        when(col("li_total").isNull, "missing_lines")
          .when(col("rel_gap_r") <= 0.0001, "match")
          .when(col("rel_gap_r") <= 0.01, "minor_gap")
          .otherwise("major_gap").as("bucket"),
        coalesce(abs(col("li_total") - col("hdr_total")),
          col("hdr_total")).cast(DecimalType(18, 6)).as("abs_gap"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("abs_gap")).cast("double"), 2).as("total_gap_r"))
      .orderBy("bucket")
  }
  private val dqReconciliationSql =
    """WITH li AS (SELECT l_orderkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2))
      |      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
      |      * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6))))
      |      AS DECIMAL(18,6)) AS li_total
      |  FROM lineitem GROUP BY 1),
      |gap AS (SELECT o.o_orderkey,
      |    CAST(o.o_totalprice AS DECIMAL(12,2)) AS hdr_total, li.li_total,
      |    CASE WHEN li.li_total IS NULL THEN NULL
      |      ELSE round(CAST(abs(li.li_total
      |          - CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |        / CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 6)
      |    END AS rel_gap_r
      |  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey),
      |b AS (SELECT
      |    CASE WHEN li_total IS NULL THEN 'missing_lines'
      |      WHEN rel_gap_r <= 0.0001 THEN 'match'
      |      WHEN rel_gap_r <= 0.01 THEN 'minor_gap'
      |      ELSE 'major_gap' END AS bucket,
      |    CAST(COALESCE(abs(li_total - hdr_total), hdr_total)
      |      AS DECIMAL(18,6)) AS abs_gap
      |  FROM gap)
      |SELECT bucket, COUNT(*) AS n_orders,
      |  round(CAST(CAST(SUM(abs_gap) AS VARCHAR) AS DOUBLE), 2)
      |    AS total_gap_r
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_rouge_pairs" -> tRougePairs,
    "w21_rolling_corr" -> w21RollingCorr,
    "dq_reconciliation" -> dqReconciliation)

  val oracleSql: Map[String, String] = Map(
    "t_rouge_pairs" -> tRougePairsSql,
    "w21_rolling_corr" -> w21RollingCorrSql,
    "dq_reconciliation" -> dqReconciliationSql)
}
