package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, sixteenth pack: the dedup savings report (what
  * exact dedup actually buys in documents and bytes — the number
  * that justifies the pipeline stage), PMI word associations
  * (pointwise mutual information over co-occurrence windows — the
  * classic distributional-semantics signal), and the hour-of-day
  * activity profile (the traffic-shape panel capacity planning and
  * anomaly baselines both start from).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier28Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // d_dedup_savings — the business case for exact dedup, per source:
  // documents whose normalized-text sha256 collides keep ONE
  // canonical survivor (lowest doc_id — the d_exact_dedup /
  // d_survivorship convention) and the report counts removed docs
  // and removed characters, with corpus-wide totals on the 'ALL'
  // row. One hash-groupBy (the dedup shuffle itself) + one
  // source-keyed rollup — the report is a free by-product of the
  // dedup pass, which is exactly how a production pipeline should
  // emit it.
  // ------------------------------------------------------------------
  private val dDedupSavings: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        sha2(TF.normText(col("text")), 256).as("h"))
    val ranked = docs
      .withColumn("keeper",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")))
    val marked = ranked.select(col("source"), col("n_chars"),
      (col("doc_id") === col("keeper")).as("kept"))
    val per = marked.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(!col("kept"), col("n_chars")).otherwise(lit(0L)))
          .as("chars_removed"))
    val tot = marked.agg(count(lit(1)).as("n_docs"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(!col("kept"), col("n_chars")).otherwise(lit(0L)))
          .as("chars_removed"))
      .select(lit("ALL").as("source"), col("n_docs"), col("n_removed"),
        col("chars_removed"))
    per.unionByName(tot)
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("n_removed").cast("long").as("n_removed"),
        col("chars_removed").cast("long").as("chars_removed"),
        round(col("n_removed").cast("double") /
          col("n_docs").cast("double"), 6).as("removal_rate_r"))
      .orderBy("source")
  }
  private val dDedupSavingsSql = {
    val norm = TF.normTextSql("text")
    s"""WITH d AS (SELECT doc_id, source, n_chars,
       |    sha256($norm) AS h
       |  FROM documents),
       |k AS (SELECT source, n_chars,
       |    doc_id = MIN(doc_id) OVER (PARTITION BY h) AS kept
       |  FROM d),
       |per AS (SELECT source, COUNT(*) AS n_docs,
       |    SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS n_removed,
       |    SUM(CASE WHEN NOT kept THEN n_chars ELSE 0 END)
       |      AS chars_removed
       |  FROM k GROUP BY 1),
       |tot AS (SELECT 'ALL' AS source, COUNT(*) AS n_docs,
       |    SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS n_removed,
       |    SUM(CASE WHEN NOT kept THEN n_chars ELSE 0 END)
       |      AS chars_removed
       |  FROM k),
       |u AS (SELECT * FROM per UNION ALL SELECT * FROM tot)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_removed AS BIGINT) AS n_removed,
       |  CAST(chars_removed AS BIGINT) AS chars_removed,
       |  round(CAST(n_removed AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS removal_rate_r
       |FROM u ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------------
  // t_pmi_pairs — pointwise mutual information over adjacent-token
  // co-occurrence: PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b))) for the
  // UNORDERED adjacent pair (a<b canonicalizes), restricted to pairs
  // seen ≥5 times (the standard low-count cutoff — PMI explodes on
  // rare pairs). Counts shuffle on token/pair keys only; the top-10
  // associations surface via the two-phase rankTopK. High-PMI pairs
  // are collocations ("machine learning"); they feed tokenizer merge
  // rules and phrase-aware dedup alike.
  // ------------------------------------------------------------------
  private val tPmiPairs: QFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(TF.normText(col("text")), " "))
          .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val wNext = Window.partitionBy("doc_id").orderBy("pos")
    val pairs = toks
      .withColumn("w2", lead(col("w"), 1).over(wNext))
      .filter(col("w2").isNotNull)
      .select(least(col("w"), col("w2")).as("a"),
        greatest(col("w"), col("w2")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val n = toks.count()
    val scored = pairs
      .join(uni.select(col("w").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("cb")), "b")
      .select(col("a"), col("b"), col("cab"),
        round(log(lit(n.toDouble) * col("cab").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double"))), 6)
          .as("pmi_r"))
    graft.operators.TopK.rankTopK(scored, 10,
        Seq(col("pmi_r").desc, col("a").asc, col("b").asc), "rnk")
      .select(col("rnk"), col("a"), col("b"), col("cab"), col("pmi_r"))
      .orderBy("rnk", "a", "b")
  }
  private val tPmiPairsSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS w,
       |    generate_subscripts(string_split($norm, ' '), 1) AS pos
       |  FROM documents),
       |tk AS (SELECT doc_id, pos, w FROM w0 WHERE length(w) > 0),
       |pr AS (SELECT least(w, w2) AS a, greatest(w, w2) AS b,
       |    COUNT(*) AS cab
       |  FROM (SELECT doc_id, w,
       |      lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |    FROM tk)
       |  WHERE w2 IS NOT NULL GROUP BY 1, 2 HAVING COUNT(*) >= 5),
       |uni AS (SELECT w, COUNT(*) AS c FROM tk GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tk),
       |sc AS (SELECT pr.a, pr.b, pr.cab,
       |    round(ln(nn.n * CAST(pr.cab AS DOUBLE)
       |      / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 6)
       |      AS pmi_r
       |  FROM pr JOIN uni ua ON ua.w = pr.a
       |  JOIN uni ub ON ub.w = pr.b CROSS JOIN nn),
       |rk AS (SELECT CAST(rank() OVER (ORDER BY pmi_r DESC, a, b)
       |      AS INT) AS rnk, a, b, cab, pmi_r
       |  FROM sc)
       |SELECT rnk, a, b, cab, pmi_r FROM rk WHERE rnk <= 10
       |ORDER BY rnk, a, b""".stripMargin
  }

  // ------------------------------------------------------------------
  // ev_hourly_profile — the hour-of-day traffic shape: per hour
  // 0–23, event counts, share of daily volume, a peak-hour flag, and
  // the peak-to-trough ratio carried on every row (constant columns
  // make the row self-describing for dashboard export). One scan,
  // one 24-row aggregate; min/max ride along via a window over the
  // bounded hour axis.
  // ------------------------------------------------------------------
  private val evHourlyProfile: QFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val hours = t(s, dir, "events")
      .select(hour(expr("timestamp_micros(ts div 1000)")).cast("long")
        .as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("n"))
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    hours
      .withColumn("tot", sum(col("n")).over(w))
      .withColumn("mx", max(col("n")).over(w))
      .withColumn("mn", min(col("n")).over(w))
      .select(col("hr"), col("n").cast("long").as("n_events"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share_r"),
        (col("n") === col("mx")).as("peak_hour"),
        round(col("mx").cast("double") / col("mn").cast("double"), 6)
          .as("peak_trough_r"))
      .orderBy("hr")
  }
  private val evHourlyProfileSql =
    """WITH h AS (SELECT CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |x AS (SELECT hr, n, SUM(n) OVER () AS tot, MAX(n) OVER () AS mx,
      |    MIN(n) OVER () AS mn
      |  FROM h)
      |SELECT hr, CAST(n AS BIGINT) AS n_events,
      |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share_r,
      |  n = mx AS peak_hour,
      |  round(CAST(mx AS DOUBLE) / CAST(mn AS DOUBLE), 6)
      |    AS peak_trough_r
      |FROM x ORDER BY hr""".stripMargin

  val queries: Map[String, QFn] = Map(
    "d_dedup_savings" -> dDedupSavings,
    "t_pmi_pairs" -> tPmiPairs,
    "ev_hourly_profile" -> evHourlyProfile)

  val oracleSql: Map[String, String] = Map(
    "d_dedup_savings" -> dDedupSavingsSql,
    "t_pmi_pairs" -> tPmiPairsSql,
    "ev_hourly_profile" -> evHourlyProfileSql)
}
