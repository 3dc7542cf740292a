package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-third pack: per-document n-gram novelty
  * (what fraction of each document's 4-grams is NEW at its position
  * in the stream — the marginal-value curve incremental curation
  * decides by), the funnel window-sensitivity sweep (the same
  * signup→click→purchase funnel at three conversion windows in one
  * pass — window choice is the most-gamed free parameter in funnel
  * reporting, so report all of them), and power-law degree fitting
  * (the Clauset–Shalizi–Newman closed-form MLE α̂ = 1 + n/Σln(x/xmin)
  * — the tail diagnostic that justifies hub-bounding).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier35Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_ngram_novelty — the marginal-novelty curve: walking documents
  // in doc_id order, each doc's novelty is the share of its 4-gram
  // occurrences whose gram was never seen in any EARLIER doc (first
  // occurrence via one row_number per gram key — the Heaps-fit
  // trick at n-gram granularity; grams hash to 60-bit keys before
  // the shuffle). Reported as doc-decile means (bounded output):
  // declining novelty along the stream is the diminishing-returns
  // signal that tells a crawler when another million pages stops
  // buying new text.
  // ------------------------------------------------------------------
  private val tNgramNovelty: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(TF.normText(col("text")), " "))
          .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val wNext = Window.partitionBy("doc_id").orderBy("pos")
    val grams = toks
      .withColumn("g", concat_ws(" ", col("w"),
        lead(col("w"), 1).over(wNext), lead(col("w"), 2).over(wNext),
        lead(col("w"), 3).over(wNext)))
      .withColumn("w3", lead(col("w"), 3).over(wNext))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          .as("h"))
    val marked = grams
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")))
      .select(col("doc_id"),
        when(col("rn") === 1, 1L).otherwise(0L).as("novel"))
    val perDoc = marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("novel")).as("n_novel"))
    val tot = perDoc.agg(max(col("doc_id")).as("mx"),
      min(col("doc_id")).as("mn"))
    perDoc.crossJoin(broadcast(tot))
      .select(
        least(lit(9), ((col("doc_id") - col("mn")) * 10 /
          (col("mx") - col("mn") + 1)).cast("long")).as("decile"),
        col("n_grams"), col("n_novel"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).cast("long").as("n_grams"),
        sum(col("n_novel")).cast("long").as("n_novel"))
      .select(col("decile"), col("n_docs"), col("n_grams"),
        col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_grams").cast("double"), 6).as("novelty_r"))
      .orderBy("decile")
  }
  private val tNgramNoveltySql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS w,
       |    generate_subscripts(string_split($norm, ' '), 1) AS pos
       |  FROM documents),
       |tk AS (SELECT doc_id, pos, w FROM w0 WHERE length(w) > 0),
       |g0 AS (SELECT doc_id, pos,
       |    w || ' ' || lead(w, 1) OVER wo || ' ' || lead(w, 2) OVER wo
       |      || ' ' || lead(w, 3) OVER wo AS g,
       |    lead(w, 3) OVER wo AS w3
       |  FROM tk WINDOW wo AS (PARTITION BY doc_id ORDER BY pos)),
       |g AS (SELECT doc_id, pos,
       |    CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h
       |  FROM g0 WHERE w3 IS NOT NULL),
       |mk AS (SELECT doc_id,
       |    CASE WHEN row_number() OVER (PARTITION BY h
       |      ORDER BY doc_id, pos) = 1 THEN 1 ELSE 0 END AS novel
       |  FROM g),
       |pd AS (SELECT doc_id, COUNT(*) AS n_grams, SUM(novel) AS n_novel
       |  FROM mk GROUP BY 1),
       |tot AS (SELECT MAX(doc_id) AS mx, MIN(doc_id) AS mn FROM pd)
       |SELECT least(9, (pd.doc_id - tot.mn) * 10
       |    // (tot.mx - tot.mn + 1)) AS decile,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       |  CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       |  round(CAST(SUM(n_novel) AS DOUBLE)
       |    / CAST(SUM(n_grams) AS DOUBLE), 6) AS novelty_r
       |FROM pd CROSS JOIN tot GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // ev_funnel_windows — window-sensitivity sweep for the signup →
  // click → purchase funnel: per-stage converted-user counts at 1-
  // hour, 1-day and 7-day conversion windows, all three from ONE
  // pass over the per-user stage-time table (the window parameter
  // only changes a comparison, so the three reports share every
  // shuffle). Divergence across columns = the funnel's sensitivity
  // to its most arbitrary knob; flat = robust.
  // ------------------------------------------------------------------
  private val evFunnelWindows: QFn = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("sec")).as("ss"))
      .localCheckpoint(true)
    def sweep(hz: Long, label: String): DataFrame = {
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("sec") >= col("ss") && col("sec") < col("ss") + hz)
        .groupBy("user_id").agg(min(col("sec")).as("cs"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("sec") >= col("cs") && col("sec") < col("cs") + hz)
        .groupBy("user_id").agg(min(col("sec")).as("ps"))
      s1.agg(count(lit(1)).as("n1"))
        .crossJoin(s2.agg(count(lit(1)).as("n2")))
        .crossJoin(s3.agg(count(lit(1)).as("n3")))
        .select(lit(label).as("conv_window"), col("n1"), col("n2"), col("n3"),
          round(col("n3").cast("double") / col("n1").cast("double"), 6)
            .as("end_to_end_r"))
    }
    sweep(3600L, "1h").unionByName(sweep(86400L, "1d"))
      .unionByName(sweep(604800L, "7d"))
      .orderBy("conv_window")
  }
  private val evFunnelWindowsSql = {
    def sweep(hz: Long, label: String): String =
      s"""SELECT '$label' AS conv_window,
         |  (SELECT COUNT(*) FROM s1) AS n1,
         |  (SELECT COUNT(*) FROM (SELECT e.user_id FROM e JOIN s1
         |      USING (user_id)
         |    WHERE e.event_type = 'click' AND e.sec >= s1.ss
         |      AND e.sec < s1.ss + $hz GROUP BY 1)) AS n2,
         |  (SELECT COUNT(*) FROM (
         |    SELECT e.user_id FROM e
         |    JOIN (SELECT e.user_id, MIN(e.sec) AS cs FROM e JOIN s1
         |        USING (user_id)
         |      WHERE e.event_type = 'click' AND e.sec >= s1.ss
         |        AND e.sec < s1.ss + $hz GROUP BY 1) c2
         |      USING (user_id)
         |    WHERE e.event_type = 'purchase' AND e.sec >= c2.cs
         |      AND e.sec < c2.cs + $hz GROUP BY 1)) AS n3,
         |  round(CAST((SELECT COUNT(*) FROM (
         |    SELECT e.user_id FROM e
         |    JOIN (SELECT e.user_id, MIN(e.sec) AS cs FROM e JOIN s1
         |        USING (user_id)
         |      WHERE e.event_type = 'click' AND e.sec >= s1.ss
         |        AND e.sec < s1.ss + $hz GROUP BY 1) c2
         |      USING (user_id)
         |    WHERE e.event_type = 'purchase' AND e.sec >= c2.cs
         |      AND e.sec < c2.cs + $hz GROUP BY 1)) AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE), 6)
         |    AS end_to_end_r""".stripMargin
    s"""WITH e AS (SELECT user_id, event_type,
       |    epoch_us(ts) // 1000000 AS sec
       |  FROM events),
       |s1 AS (SELECT user_id, MIN(sec) AS ss FROM e
       |  WHERE event_type = 'signup' GROUP BY 1)
       |${sweep(3600L, "1h")}
       |UNION ALL
       |${sweep(86400L, "1d")}
       |UNION ALL
       |${sweep(604800L, "7d")}
       |ORDER BY conv_window""".stripMargin
  }

  // ------------------------------------------------------------------
  // g_powerlaw_fit — discrete power-law tail fit on the co-purchase
  // degree distribution: the CSN continuous-MLE approximation
  // α̂ = 1 + n / Σ ln(deg / (xmin − ½)) over degrees ≥ xmin = 2,
  // with its standard error (α̂−1)/√n. Every ln term is ONE rounded
  // double frozen as DECIMAL(18,6) (order-free sum); degree counts
  // are exact. α near 2–3 with a fat tail is WHY per-node caps and
  // salting exist — this entry measures the exponent instead of
  // assuming it.
  // ------------------------------------------------------------------
  private val gPowerlawFit: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2)
    val deg = e0.select(col("pa").as("v"))
      .unionAll(e0.select(col("pb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
    val terms = deg.select(
      round(log(col("deg").cast("double") / 1.5), 6)
        .cast(DecimalType(18, 6)).as("lt"))
    terms.agg(count(lit(1)).cast("long").as("n_tail"),
        sum(col("lt")).as("slt"))
      .select(col("n_tail"),
        round(lit(1.0) + col("n_tail").cast("double") /
          col("slt").cast("double"), 6).as("alpha_r"),
        round((col("n_tail").cast("double") /
          col("slt").cast("double")) /
          sqrt(col("n_tail").cast("double")), 6).as("alpha_se_r"))
  }
  private val gPowerlawFitSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM op a JOIN op b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT v, COUNT(*) AS deg FROM (
      |    SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0)
      |  GROUP BY 1 HAVING COUNT(*) >= 2),
      |terms AS (SELECT CAST(round(ln(CAST(deg AS DOUBLE) / 1.5), 6)
      |    AS DECIMAL(18,6)) AS lt
      |  FROM deg)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
      |  round(1.0 + CAST(COUNT(*) AS DOUBLE)
      |    / CAST(SUM(lt) AS DOUBLE), 6) AS alpha_r,
      |  round((CAST(COUNT(*) AS DOUBLE) / CAST(SUM(lt) AS DOUBLE))
      |    / sqrt(CAST(COUNT(*) AS DOUBLE)), 6) AS alpha_se_r
      |FROM terms""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_ngram_novelty" -> tNgramNovelty,
    "ev_funnel_windows" -> evFunnelWindows,
    "g_powerlaw_fit" -> gPowerlawFit)

  val oracleSql: Map[String, String] = Map(
    "t_ngram_novelty" -> tNgramNoveltySql,
    "ev_funnel_windows" -> evFunnelWindowsSql,
    "g_powerlaw_fit" -> gPowerlawFitSql)
}
