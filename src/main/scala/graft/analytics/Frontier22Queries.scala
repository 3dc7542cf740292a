package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, tenth pack: stylometric source fingerprinting
  * (Burrows-Delta-style function-word profiles — the attribution/
  * near-source detector a provenance audit runs), cosine RANGE
  * search over embeddings (all-neighbors-within-τ, the radius twin
  * of the top-k entries — dedup and recall audits want "everything
  * closer than τ", not a fixed k), and — registered in
  * StreamingQueries — a stream-static enrichment join.
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier22Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_style_fingerprint — Burrows-Delta stylometry over sources: the
  // 15 corpus-wide most frequent words are the function-word panel
  // (frequency-ranked, tie-broken on the word — both engines agree);
  // each source's panel-word RATE (per-1000-token) z-normalizes
  // against the across-source mean/std of that word; Delta between
  // two sources is the mean |z_a − z_b| over the panel. The closest
  // 5 source pairs surface — style-twin sources are what a
  // provenance/contamination audit chases. Rates and z-scores are
  // ONE rounded double each frozen as DECIMAL; the pair join runs on
  // the 20×15 profile table (sources × panel — data-scale-invariant;
  // the corpus only feeds it through two key-partitioned counts).
  // ------------------------------------------------------------------
  private val tStyleFingerprint: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(split(TF.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val panel = graft.operators.TopK.rankTopK(
        toks.groupBy("w").agg(count(lit(1)).as("gc")), 15,
        Seq(col("gc").desc, col("w").asc), "prnk")
      .select(col("w"))
    val srcTot = toks.groupBy("source").agg(count(lit(1)).as("nt"))
    // per-source per-panel-word rate (per mille), zero when absent
    val rates = srcTot.crossJoin(broadcast(panel))
      .join(toks.groupBy("source", "w").agg(count(lit(1)).as("c")),
        Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        round(coalesce(col("c"), lit(0L)).cast("double") * 1000.0 /
          col("nt").cast("double"), 6).cast(DecimalType(18, 6)).as("rate"))
      .localCheckpoint(true)
    val wordStats = rates.groupBy("w")
      .agg(count(lit(1)).as("ns"), sum(col("rate")).as("sr"),
        sum((col("rate") * col("rate")).cast(DecimalType(38, 12)))
          .as("srr"))
    val z = rates.join(broadcast(wordStats), "w")
      .select(col("source"), col("w"),
        round((col("rate") - col("sr") / col("ns")).cast("double") /
          sqrt((col("srr").cast("double") -
            (col("sr") * col("sr")).cast("double") /
              col("ns").cast("double")) / col("ns").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("z"))
    val pairs = z.select(col("source").as("sa"), col("w"),
        col("z").as("za"))
      .join(z.select(col("source").as("sb"), col("w"),
        col("z").as("zb")), "w")
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("np"),
        sum(abs(col("za") - col("zb"))).as("sad"))
      .select(col("sa"), col("sb"),
        round(col("sad").cast("double") / col("np").cast("double"), 6)
          .as("delta_r"))
    graft.operators.TopK.rankTopK(pairs, 5,
        Seq(col("delta_r").asc, col("sa").asc, col("sb").asc), "rnk")
      .select(col("rnk"), col("sa"), col("sb"), col("delta_r"))
      .orderBy("rnk", "sa", "sb")
  }
  private val tStyleFingerprintSql = {
    val norm = TF.normTextSql("text")
    s"""WITH tk AS (SELECT source, unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |toks AS (SELECT source, w FROM tk WHERE length(w) > 0),
       |panel AS (SELECT w FROM (SELECT w, COUNT(*) AS gc FROM toks
       |    GROUP BY 1)
       |  QUALIFY rank() OVER (ORDER BY gc DESC, w) <= 15),
       |st AS (SELECT source, COUNT(*) AS nt FROM toks GROUP BY 1),
       |sw AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |rates AS (SELECT st.source, panel.w,
       |    CAST(round(CAST(COALESCE(sw.c, 0) AS DOUBLE) * 1000.0
       |      / CAST(st.nt AS DOUBLE), 6) AS DECIMAL(18,6)) AS rate
       |  FROM st CROSS JOIN panel
       |  LEFT JOIN sw ON sw.source = st.source AND sw.w = panel.w),
       |ws AS (SELECT w, COUNT(*) AS ns, SUM(rate) AS sr,
       |    SUM(CAST(rate * rate AS DECIMAL(38,12))) AS srr
       |  FROM rates GROUP BY 1),
       |z AS (SELECT r.source, r.w,
       |    CAST(round(CAST(r.rate - ws.sr / ws.ns AS DOUBLE)
       |      / sqrt((CAST(ws.srr AS DOUBLE)
       |          - CAST(ws.sr * ws.sr AS DOUBLE) / CAST(ws.ns AS DOUBLE))
       |        / CAST(ws.ns AS DOUBLE)), 6) AS DECIMAL(18,6)) AS z
       |  FROM rates r JOIN ws ON ws.w = r.w),
       |pairs AS (SELECT a.source AS sa, b.source AS sb,
       |    round(CAST(SUM(abs(a.z - b.z)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS delta_r
       |  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
       |  GROUP BY 1, 2),
       |rk AS (SELECT CAST(rank() OVER (ORDER BY delta_r, sa, sb) AS INT)
       |    AS rnk, sa, sb, delta_r
       |  FROM pairs)
       |SELECT rnk, sa, sb, delta_r FROM rk WHERE rnk <= 5
       |ORDER BY rnk, sa, sb""".stripMargin
  }

  // ------------------------------------------------------------------
  // ann_range_search — all-pairs-within-τ cosine range query: for 5
  // md5-chosen probe vectors, return EVERY corpus vector with
  // cosine ≥ 0.2 (range semantics — the recall-audit twin of top-k,
  // where the answer SIZE is data-dependent). Cosine runs over the
  // frozen-decimal dims: dot and the two norms are exact decimal
  // sums shuffled on the dim key; the single √ product and the
  // division happen in ONE rounded double per pair. Returns per-
  // probe neighbor counts + id checksum + the max cosine — bounded
  // output regardless of how many neighbors fall inside τ.
  // ------------------------------------------------------------------
  private val annRangeSearch: QFn = (s, dir) => {
    val pts = graft.ml.KMeans.pointsLong(t(s, dir, "embeddings"))
      .localCheckpoint(true)
    val probeIds = t(s, dir, "embeddings")
      .select(col("vec_id"),
        md5(concat(lit("rs:"), col("vec_id").cast("string"))).as("h"))
    val probes = graft.operators.TopK.rankTopK(probeIds, 5,
        Seq(col("h").asc, col("vec_id").asc), "prnk")
      .select(col("vec_id").as("qid"))
    val qpts = pts.join(broadcast(probes), col("vec_id") === col("qid"))
      .select(col("qid"), col("dim"), col("vd").as("qd"))
    val norms = pts.groupBy("vec_id")
      .agg(sum((col("vd") * col("vd")).cast(DecimalType(38, 12)))
        .as("x2"))
      .localCheckpoint(true)
    val dots = pts.join(qpts, "dim")
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum((col("vd") * col("qd")).cast(DecimalType(38, 12)))
        .as("dot"))
    val cos = dots
      .join(norms, "vec_id")
      .join(broadcast(norms.select(col("vec_id").as("qid"),
        col("x2").as("q2"))), "qid")
      .select(col("qid"), col("vec_id"),
        round(col("dot").cast("double") /
          sqrt(col("x2").cast("double") * col("q2").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("cos"))
      .filter(col("cos") >= 0.2)
    cos.groupBy("qid")
      .agg(count(lit(1)).as("n_neighbors"),
        sum(col("vec_id")).cast("long").as("id_checksum"),
        max(col("cos")).cast("string").as("max_cos"))
      .orderBy("qid")
  }
  private val annRangeSearchSql =
    """WITH pts AS (SELECT vec_id, dim - 1 AS dim,
      |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) AS dim
      |    FROM embeddings)),
      |pr AS (SELECT vec_id AS qid FROM (SELECT vec_id,
      |      md5('rs:' || CAST(vec_id AS VARCHAR)) AS h
      |    FROM embeddings)
      |  QUALIFY rank() OVER (ORDER BY h, vec_id) <= 5),
      |qp AS (SELECT pr.qid, p.dim, p.vd AS qd
      |  FROM pts p JOIN pr ON pr.qid = p.vec_id),
      |norms AS (SELECT vec_id,
      |    SUM(CAST(vd * vd AS DECIMAL(38,12))) AS x2
      |  FROM pts GROUP BY 1),
      |dots AS (SELECT q.qid, p.vec_id,
      |    SUM(CAST(p.vd * q.qd AS DECIMAL(38,12))) AS dot
      |  FROM pts p JOIN qp q ON q.dim = p.dim
      |  WHERE p.vec_id <> q.qid
      |  GROUP BY 1, 2),
      |cos AS (SELECT d.qid, d.vec_id,
      |    CAST(round(CAST(d.dot AS DOUBLE)
      |      / sqrt(CAST(nx.x2 AS DOUBLE) * CAST(nq.x2 AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS cos
      |  FROM dots d JOIN norms nx ON nx.vec_id = d.vec_id
      |  JOIN norms nq ON nq.vec_id = d.qid)
      |SELECT qid, COUNT(*) AS n_neighbors,
      |  CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
      |  CAST(MAX(cos) AS VARCHAR) AS max_cos
      |FROM cos WHERE cos >= 0.2
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_style_fingerprint" -> tStyleFingerprint,
    "ann_range_search" -> annRangeSearch)

  val oracleSql: Map[String, String] = Map(
    "t_style_fingerprint" -> tStyleFingerprintSql,
    "ann_range_search" -> annRangeSearchSql)
}
