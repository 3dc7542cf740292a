package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, eleventh pack: the classifier evaluation report
  * (confusion matrix → precision/recall/F1/MCC — the table every
  * model review opens with, here on the backtested prior-spend →
  * future-buyer rule), behavioral user-similarity search (event-mix
  * share vectors + cosine — the collaborative-filtering primitive on
  * the behavior axis), and a JSON construction/extraction pack
  * (to_json ∘ get_json_object round-trips and JSON-array handling —
  * the semi-structured function surface beyond ev_json_extract's
  * schema parse).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier23Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ml_eval_report — the full binary-classification scorecard for the
  // median-prior-spend rule (predict "future buyer" when pre-1998
  // spend ≥ the exact median): TP/FP/TN/FN from one aggregation,
  // then accuracy, precision, recall, F1 and Matthews correlation —
  // each ONE rounded double over the exact integer cells (the MCC
  // numerator TP·TN−FP·FN stays in exact BIGINT). The median is the
  // engine-shared interpolated percentile; the label pass and the
  // confusion pass are two key-partitioned aggregates — the whole
  // report costs two scans of the per-customer table at any scale.
  // ------------------------------------------------------------------
  private val mlEvalReport: QFn = (s, dir) => {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(when(year(col("o_orderdate")) < 1998,
          col("o_totalprice").cast(DecimalType(18, 4)))).as("pre_spend"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("buyer"))
      .filter(col("pre_spend").isNotNull)
      .localCheckpoint(true)
    val med = cust.agg(expr(
      "percentile(CAST(pre_spend AS DOUBLE), 0.5)").as("med"))
    val conf = cust.crossJoin(broadcast(med))
      .select(
        when(col("pre_spend").cast("double") >= col("med"), 1L)
          .otherwise(0L).as("pred"), col("buyer"))
      .agg(
        sum(when(col("pred") === 1 && col("buyer") === 1, 1L)
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("pred") === 1 && col("buyer") === 0, 1L)
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("pred") === 0 && col("buyer") === 0, 1L)
          .otherwise(0L)).cast("long").as("tn"),
        sum(when(col("pred") === 0 && col("buyer") === 1, 1L)
          .otherwise(0L)).cast("long").as("fn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    // zero-cell guards: a degenerate confusion matrix (no predicted or
    // no actual positives) reports 0, not a crash — the convention
    // sklearn uses with zero_division=0
    conf.select(col("tp"), col("fp"), col("tn"), col("fn"),
      round((tp + tn) / (tp + tn + fp + fn), 6).as("accuracy_r"),
      when(col("tp") + col("fp") === 0, lit(0.0))
        .otherwise(round(tp / (tp + fp), 6)).as("precision_r"),
      when(col("tp") + col("fn") === 0, lit(0.0))
        .otherwise(round(tp / (tp + fn), 6)).as("recall_r"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, lit(0.0))
        .otherwise(round(lit(2.0) * tp / (lit(2.0) * tp + fp + fn), 6))
        .as("f1_r"),
      when((col("tp") + col("fp")) * (col("tp") + col("fn")) *
          (col("tn") + col("fp")) * (col("tn") + col("fn")) === 0,
          lit(0.0))
        .otherwise(round((col("tp") * col("tn") - col("fp") * col("fn"))
            .cast("double") /
          sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 6))
        .as("mcc_r"))
  }
  private val mlEvalReportSql =
    """WITH cust AS (SELECT o_custkey,
      |    SUM(CASE WHEN year(o_orderdate) < 1998
      |      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS pre_spend,
      |    MAX(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
      |      AS buyer
      |  FROM orders GROUP BY 1),
      |c2 AS (SELECT * FROM cust WHERE pre_spend IS NOT NULL),
      |m AS (SELECT quantile_cont(CAST(pre_spend AS DOUBLE), 0.5) AS med
      |  FROM c2),
      |conf AS (SELECT
      |    CAST(SUM(CASE WHEN CAST(pre_spend AS DOUBLE) >= med
      |      AND buyer = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN CAST(pre_spend AS DOUBLE) >= med
      |      AND buyer = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN CAST(pre_spend AS DOUBLE) < med
      |      AND buyer = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |    CAST(SUM(CASE WHEN CAST(pre_spend AS DOUBLE) < med
      |      AND buyer = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM c2 CROSS JOIN m)
      |SELECT tp, fp, tn, fn,
      |  round((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
      |    / (CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)
      |      + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6) AS accuracy_r,
      |  CASE WHEN tp + fp = 0 THEN 0.0 ELSE round(CAST(tp AS DOUBLE)
      |    / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)), 6) END
      |    AS precision_r,
      |  CASE WHEN tp + fn = 0 THEN 0.0 ELSE round(CAST(tp AS DOUBLE)
      |    / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)), 6) END
      |    AS recall_r,
      |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
      |    ELSE round(2.0 * CAST(tp AS DOUBLE)
      |      / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
      |        + CAST(fn AS DOUBLE)), 6) END AS f1_r,
      |  CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0
      |    THEN 0.0
      |    ELSE round(CAST(tp * tn - fp * fn AS DOUBLE)
      |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
      |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
      |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
      |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 6) END
      |    AS mcc_r
      |FROM conf""".stripMargin

  // ------------------------------------------------------------------
  // ev_user_similarity — behavioral nearest neighbors: each user's
  // event-type MIX (share of clicks/views/purchases/... among their
  // events, frozen DECIMAL(18,6)) is a 5-dim behavior vector; for 5
  // md5-chosen probe users, the top-3 most cosine-similar other
  // users surface. Shares join on the tiny event-type key, cosine
  // numerator/norms are exact decimal sums, ONE rounded double per
  // pair; the per-probe window ranks |probes|·|users| pairs — linear
  // in users for a fixed probe set, the same bounded-probe contract
  // as ann_range_search. Behavioral twins power both recommendation
  // and fraud ("accounts that behave identically").
  // ------------------------------------------------------------------
  private val evUserSimilarity: QFn = (s, dir) => {
    val mix = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("nt", sum(col("c")).over(
        Window.partitionBy("user_id")))
      .select(col("user_id"), col("event_type"),
        round(col("c").cast("double") / col("nt").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("share"))
      .localCheckpoint(true)
    val probes = graft.operators.TopK.rankTopK(
        mix.select(col("user_id")).distinct()
          .select(col("user_id"),
            md5(concat(lit("us:"), col("user_id").cast("string")))
              .as("h")), 5,
        Seq(col("h").asc, col("user_id").asc), "prnk")
      .select(col("user_id").as("probe"))
    val norms = mix.groupBy("user_id")
      .agg(sum((col("share") * col("share")).cast(DecimalType(38, 12)))
        .as("n2"))
      .localCheckpoint(true)
    val pShares = mix.join(broadcast(probes),
        col("user_id") === col("probe"))
      .select(col("probe"), col("event_type"), col("share").as("ps"))
    val dots = mix.join(broadcast(pShares), "event_type")
      .filter(col("user_id") =!= col("probe"))
      .groupBy("probe", "user_id")
      .agg(sum((col("share") * col("ps")).cast(DecimalType(38, 12)))
        .as("dot"))
    val cos = dots
      .join(norms, "user_id")
      .join(broadcast(norms.select(col("user_id").as("probe"),
        col("n2").as("p2"))), "probe")
      .select(col("probe"), col("user_id"),
        round(col("dot").cast("double") /
          sqrt(col("n2").cast("double") * col("p2").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("cos"))
    val w = Window.partitionBy("probe")
      .orderBy(col("cos").desc, col("user_id").asc)
    cos.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("probe"), col("rnk"), col("user_id"),
        col("cos").cast("string").as("cosine"))
      .orderBy("probe", "rnk")
  }
  private val evUserSimilaritySql =
    """WITH mix AS (SELECT user_id, event_type,
      |    CAST(round(CAST(COUNT(*) AS DOUBLE)
      |      / CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS DOUBLE),
      |      6) AS DECIMAL(18,6)) AS share
      |  FROM events GROUP BY 1, 2),
      |pr AS (SELECT user_id AS probe FROM (SELECT DISTINCT user_id
      |    FROM mix),
      |    LATERAL (SELECT md5('us:' || CAST(user_id AS VARCHAR)) AS h)
      |  QUALIFY rank() OVER (ORDER BY h, user_id) <= 5),
      |norms AS (SELECT user_id,
      |    SUM(CAST(share * share AS DECIMAL(38,12))) AS n2
      |  FROM mix GROUP BY 1),
      |ps AS (SELECT pr.probe, mix.event_type, mix.share AS ps
      |  FROM mix JOIN pr ON pr.probe = mix.user_id),
      |dots AS (SELECT ps.probe, mix.user_id,
      |    SUM(CAST(mix.share * ps.ps AS DECIMAL(38,12))) AS dot
      |  FROM mix JOIN ps ON ps.event_type = mix.event_type
      |  WHERE mix.user_id <> ps.probe
      |  GROUP BY 1, 2),
      |cos AS (SELECT d.probe, d.user_id,
      |    CAST(round(CAST(d.dot AS DOUBLE)
      |      / sqrt(CAST(nx.n2 AS DOUBLE) * CAST(np.n2 AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS cos
      |  FROM dots d JOIN norms nx ON nx.user_id = d.user_id
      |  JOIN norms np ON np.user_id = d.probe),
      |rk AS (SELECT probe, user_id, cos,
      |    row_number() OVER (PARTITION BY probe
      |      ORDER BY cos DESC, user_id) AS rnk
      |  FROM cos)
      |SELECT probe, CAST(rnk AS INT) AS rnk, user_id,
      |  CAST(cos AS VARCHAR) AS cosine
      |FROM rk WHERE rnk <= 3
      |ORDER BY probe, rnk""".stripMargin

  // ------------------------------------------------------------------
  // f_json_pack — JSON construction + path extraction round-trip:
  // each order serializes to a JSON document (scalars via struct →
  // to_json; the order's line quantities as a JSON ARRAY), then the
  // fields come BACK out through path extraction (get_json_object /
  // json_extract) and aggregate. The check is value-based — each
  // engine round-trips through its OWN json formatter, so the hash
  // pins extraction semantics (paths, array indexing, array length,
  // missing-path → NULL), not byte-level whitespace. One join to
  // collect the arrays, one aggregation — plain key-partitioned
  // shapes.
  // ------------------------------------------------------------------
  private val fJsonPack: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(to_json(sort_array(collect_list(col("l_linenumber"))))
        .as("lines_json"))
    val doc = t(s, dir, "orders")
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderkey").as("key"),
          col("o_orderpriority").as("pri"))).as("doc"),
        col("lines_json"))
    doc.select(
        get_json_object(col("doc"), "$.key").cast("long").as("k_back"),
        get_json_object(col("doc"), "$.pri").as("pri_back"),
        get_json_object(col("doc"), "$.missing").as("missing"),
        get_json_object(col("lines_json"), "$[0]").cast("long")
          .as("first_line"),
        when(col("lines_json").isNotNull,
          size(from_json(col("lines_json"),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType))))
          .otherwise(lit(null)).cast("long").as("n_lines"),
        col("o_orderkey"))
      .groupBy(col("pri_back"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("k_back") === col("o_orderkey"), 1L).otherwise(0L))
          .cast("long").as("n_key_roundtrip"),
        sum(when(col("missing").isNull, 1L).otherwise(0L))
          .cast("long").as("n_missing_null"),
        sum(coalesce(col("first_line"), lit(0L))).cast("long")
          .as("first_line_sum"),
        sum(coalesce(col("n_lines"), lit(0L))).cast("long")
          .as("total_lines"))
      .orderBy("pri_back")
  }
  private val fJsonPackSql =
    """WITH li AS (SELECT l_orderkey,
      |    CAST(to_json(list_sort(list(l_linenumber))) AS VARCHAR)
      |      AS lines_json
      |  FROM lineitem GROUP BY 1),
      |doc AS (SELECT o_orderkey,
      |    to_json(struct_pack(key := o_orderkey, pri := o_orderpriority))
      |      AS d,
      |    li.lines_json
      |  FROM orders LEFT JOIN li ON li.l_orderkey = o_orderkey),
      |ex AS (SELECT o_orderkey,
      |    CAST(json_extract_string(d, '$.key') AS BIGINT) AS k_back,
      |    json_extract_string(d, '$.pri') AS pri_back,
      |    json_extract_string(d, '$.missing') AS missing,
      |    CAST(json_extract_string(lines_json, '$[0]') AS BIGINT)
      |      AS first_line,
      |    CAST(json_array_length(lines_json) AS BIGINT) AS n_lines
      |  FROM doc)
      |SELECT pri_back, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN k_back = o_orderkey THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_key_roundtrip,
      |  CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_missing_null,
      |  CAST(SUM(COALESCE(first_line, 0)) AS BIGINT) AS first_line_sum,
      |  CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS total_lines
      |FROM ex GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ml_eval_report" -> mlEvalReport,
    "ev_user_similarity" -> evUserSimilarity,
    "f_json_pack" -> fJsonPack)

  val oracleSql: Map[String, String] = Map(
    "ml_eval_report" -> mlEvalReportSql,
    "ev_user_similarity" -> evUserSimilaritySql,
    "f_json_pack" -> fJsonPackSql)
}
