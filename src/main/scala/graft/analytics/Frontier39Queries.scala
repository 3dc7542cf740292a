package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-seventh pack: cross-modality similarity
  * agreement (does 3-shingle Jaccard over the text agree with cosine
  * over the embeddings on the SAME pairs? — the diagnostic that
  * decides whether cheap lexical dedup can stand in for semantic
  * dedup), the run-length-encoding advisor (the sorted-layout
  * sibling of s31's dictionary advisor — runs along the natural
  * order decide whether RLE pays), and dedup bias measurement (how
  * exact dedup SHIFTS corpus statistics — removal is a filter, and
  * every filter moves the mean somewhere).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier39Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // d_modality_agreement — lexical-vs-semantic similarity on the
  // aligned (doc_id, doc_id+1) pair set: 3-shingle Jaccard (exact,
  // hashed-shingle counting — the d_ngram discipline) against the
  // frozen-decimal embedding cosine for the same ids, correlated by
  // the a14 Pearson idiom over frozen per-pair DECIMAL(18,6) scores.
  // High r = lexical dedup is a safe cheap proxy; low r = the
  // semantic pass earns its FLOPs. Everything shuffles on pair/dim
  // keys; the correlation runs on the bounded pair table.
  // ------------------------------------------------------------------
  private val dModalityAgreement: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        split(TF.normText(col("text")), " ").as("toks"))
    val sh = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("w2", lead(col("w"), 1).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .withColumn("w3", lead(col("w"), 2).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"),
        conv(substring(md5(concat_ws(" ", col("w"), col("w2"),
          col("w3"))), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .localCheckpoint(true)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("doc_id").as("pa"), col("h"))
      .join(sh.select((col("doc_id") - 1).as("pa"), col("h")), Seq("pa", "h"))
      .groupBy("pa").agg(count(lit(1)).as("ov"))
    val jac = sizes.select(col("doc_id").as("pa"), col("sz").as("sa"))
      .join(sizes.select((col("doc_id") - 1).as("pa"), col("sz").as("sb")),
        "pa")
      .join(inter, Seq("pa"), "left")
      .select(col("pa"),
        round(coalesce(col("ov"), lit(0L)).cast("double") /
          (col("sa") + col("sb") - coalesce(col("ov"), lit(0L)))
            .cast("double"), 6).cast(DecimalType(18, 6)).as("jac"))
    val pts = graft.ml.KMeans.pointsLong(t(s, dir, "embeddings"))
      .localCheckpoint(true)
    val norms = pts.groupBy("vec_id")
      .agg(sum((col("vd") * col("vd")).cast(DecimalType(38, 12)))
        .as("x2"))
    val dots = pts.select(col("vec_id").as("pa"), col("dim"),
        col("vd").as("va"))
      .join(pts.select((col("vec_id") - 1).as("pa"), col("dim"),
        col("vd").as("vb")), Seq("pa", "dim"))
      .groupBy("pa")
      .agg(sum((col("va") * col("vb")).cast(DecimalType(38, 12)))
        .as("dot"))
    val cos = dots
      .join(norms.select(col("vec_id").as("pa"), col("x2").as("na")),
        "pa")
      .join(norms.select((col("vec_id") - 1).as("pa"),
        col("x2").as("nb")), "pa")
      .select(col("pa"),
        round(col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("cos"))
    val paired = jac.join(cos, "pa")
      .select(col("jac").as("x"), col("cos").as("y"))
    val m = paired.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx0"),
      sum((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy0"),
      sum((col("y") * col("y")).cast(DecimalType(38, 12))).as("syy0"))
    val n = col("n")
    val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
    val sxx = col("sxx0").cast("double"); val syy = col("syy0").cast("double")
    val sxy = col("sxy0").cast("double")
    m.select(n.as("n_pairs"),
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        .as("pearson_r"))
  }
  private val dModalityAgreementSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS w,
       |    generate_subscripts(string_split($norm, ' '), 1) AS pos
       |  FROM documents),
       |tk AS (SELECT doc_id, pos, w FROM w0 WHERE length(w) > 0),
       |s0 AS (SELECT doc_id,
       |    w || ' ' || lead(w, 1) OVER wo || ' ' || lead(w, 2) OVER wo
       |      AS g,
       |    lead(w, 2) OVER wo AS w3
       |  FROM tk WINDOW wo AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT DISTINCT doc_id,
       |    CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h
       |  FROM s0 WHERE w3 IS NOT NULL),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       |iv AS (SELECT a.doc_id AS pa, COUNT(*) AS ov
       |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND b.h = a.h
       |  GROUP BY 1),
       |jac AS (SELECT sa.doc_id AS pa,
       |    CAST(round(CAST(COALESCE(iv.ov, 0) AS DOUBLE)
       |      / CAST(sa.sz + sb.sz - COALESCE(iv.ov, 0) AS DOUBLE), 6)
       |      AS DECIMAL(18,6)) AS x
       |  FROM sz sa JOIN sz sb ON sb.doc_id = sa.doc_id + 1
       |  LEFT JOIN iv ON iv.pa = sa.doc_id),
       |pts AS (SELECT vec_id, dim - 1 AS dim,
       |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |      generate_subscripts(embedding, 1) AS dim
       |    FROM embeddings)),
       |norms AS (SELECT vec_id,
       |    SUM(CAST(vd * vd AS DECIMAL(38,12))) AS x2
       |  FROM pts GROUP BY 1),
       |dots AS (SELECT a.vec_id AS pa,
       |    SUM(CAST(a.vd * b.vd AS DECIMAL(38,12))) AS dot
       |  FROM pts a JOIN pts b ON b.vec_id = a.vec_id + 1
       |    AND b.dim = a.dim
       |  GROUP BY 1),
       |cosv AS (SELECT d.pa,
       |    CAST(round(CAST(d.dot AS DOUBLE)
       |      / sqrt(CAST(na.x2 AS DOUBLE) * CAST(nb.x2 AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS y
       |  FROM dots d JOIN norms na ON na.vec_id = d.pa
       |  JOIN norms nb ON nb.vec_id = d.pa + 1),
       |pr AS (SELECT jac.x, cosv.y FROM jac JOIN cosv USING (pa)),
       |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx0, SUM(y) AS sy0,
       |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx0,
       |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy0,
       |    SUM(CAST(y * y AS DECIMAL(38,12))) AS syy0
       |  FROM pr),
       |d AS (SELECT n,
       |    CAST(CAST(sx0 AS VARCHAR) AS DOUBLE) AS sx,
       |    CAST(CAST(sy0 AS VARCHAR) AS DOUBLE) AS sy,
       |    CAST(CAST(sxx0 AS VARCHAR) AS DOUBLE) AS sxx,
       |    CAST(CAST(sxy0 AS VARCHAR) AS DOUBLE) AS sxy,
       |    CAST(CAST(syy0 AS VARCHAR) AS DOUBLE) AS syy
       |  FROM m)
       |SELECT n AS n_pairs,
       |  round((n * sxy - sx * sy)
       |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
       |    AS pearson_r
       |FROM d""".stripMargin
  }

  // ------------------------------------------------------------------
  // s32_rle_advisor — run-length encoding advisor along the table's
  // natural (orderkey, linenumber) order: for each candidate column,
  // count the RUNS (value changes along the order — one lag() pass),
  // the mean run length, and the estimated RLE bytes (runs × (value
  // width + 4-byte count)) vs raw — the verdict says which columns
  // reward sorting before writing. The complement of s31: dictionary
  // exploits few DISTINCT values, RLE exploits few CHANGES.
  // ------------------------------------------------------------------
  private val s32RleAdvisor: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").cast("string").as("ship"))
      .localCheckpoint(true)
    val w = Window.orderBy("l_orderkey", "l_linenumber")
    def advise(cname: String): DataFrame = li
      .withColumn("prev", lag(col(cname), 1).over(w))
      .select(
        when(col("prev").isNull || col("prev") =!= col(cname), 1L)
          .otherwise(0L).as("brk"),
        length(col(cname)).cast("long").as("bytes"))
      .agg(count(lit(1)).as("n_rows"), sum(col("brk")).as("n_runs"),
        sum(col("bytes")).as("raw_bytes"),
        // value bytes per run approximated by the column's mean width
        round(sum(col("bytes")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_width"))
      .select(lit(cname).as("column_name"), col("n_rows").cast("long")
        .as("n_rows"), col("n_runs").cast("long").as("n_runs"),
        col("raw_bytes").cast("long").as("raw_bytes"),
        round(col("n_rows").cast("double") /
          col("n_runs").cast("double"), 6).as("mean_run_len_r"),
        (col("n_runs").cast("double") * (col("mean_width") + 4.0) <
          col("raw_bytes").cast("double")).as("rle_pays"))
    advise("l_returnflag").unionByName(advise("l_linestatus"))
      .unionByName(advise("ship"))
      .orderBy("column_name")
  }
  private val s32RleAdvisorSql = {
    def advise(cname: String, expr0: String): String =
      s"""SELECT '$cname' AS column_name,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(brk) AS BIGINT) AS n_runs,
         |  CAST(SUM(bytes) AS BIGINT) AS raw_bytes,
         |  round(CAST(COUNT(*) AS DOUBLE)
         |    / CAST(SUM(brk) AS DOUBLE), 6) AS mean_run_len_r,
         |  CAST(SUM(brk) AS DOUBLE)
         |    * (round(CAST(SUM(bytes) AS DOUBLE)
         |        / CAST(COUNT(*) AS DOUBLE), 6) + 4.0)
         |    < CAST(SUM(bytes) AS DOUBLE) AS rle_pays
         |FROM (SELECT CASE WHEN lag($expr0) OVER wo IS NULL
         |      OR lag($expr0) OVER wo <> $expr0 THEN 1 ELSE 0 END
         |      AS brk,
         |    CAST(length($expr0) AS BIGINT) AS bytes
         |  FROM lineitem
         |  WINDOW wo AS (ORDER BY l_orderkey, l_linenumber))"""
        .stripMargin
    s"""${advise("l_returnflag", "l_returnflag")}
       |UNION ALL
       |${advise("l_linestatus", "l_linestatus")}
       |UNION ALL
       |${advise("ship",
         "CAST(CAST(l_shipdate AS DATE) AS VARCHAR)")}
       |ORDER BY column_name""".stripMargin
  }

  // ------------------------------------------------------------------
  // d_dedup_bias — what exact dedup does to corpus statistics: mean
  // document length and mean quality proxy (distinct-word ratio)
  // BEFORE and AFTER keeping one doc per normalized-text hash. Dedup
  // is a biased filter — duplicates are not uniform over length or
  // quality — and this entry MEASURES the shift instead of assuming
  // it away (the Lee et al. finding that dedup changes the
  // distribution, quantified per corpus). One hash-groupBy (the
  // dedup itself) + two aggregates over exact counts.
  // ------------------------------------------------------------------
  private val dDedupBias: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        filter(split(TF.normText(col("text")), " "),
          x => length(x) > 0).as("toks"),
        sha2(TF.normText(col("text")), 256).as("h"))
      .select(col("doc_id"), col("n_chars"), col("h"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"))
      .withColumn("keeper", min(col("doc_id")).over(
        Window.partitionBy("h")))
      .localCheckpoint(true)
    def stats(df: DataFrame, label: String): DataFrame = df
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sc"), sum(col("n_toks")).as("st"),
        sum(expr("n_types * 1000000L div n_toks")
          .cast(DecimalType(38, 0))).as("sttr"))
      .select(lit(label).as("corpus"), col("n_docs").cast("long")
        .as("n_docs"),
        round(col("sc").cast("double") / col("n_docs").cast("double"), 4)
          .as("mean_chars_r"),
        round(col("st").cast("double") / col("n_docs").cast("double"), 4)
          .as("mean_tokens_r"),
        round(col("sttr").cast("double") /
          (col("n_docs").cast("double") * 1000000.0), 6)
          .as("mean_ttr_r"))
    stats(docs, "before")
      .unionByName(stats(docs.filter(col("doc_id") === col("keeper")),
        "after"))
      .orderBy("corpus")
  }
  private val dDedupBiasSql = {
    val norm = TF.normTextSql("text")
    s"""WITH d0 AS (SELECT doc_id, n_chars,
       |    list_filter(string_split($norm, ' '), x -> length(x) > 0)
       |      AS toks,
       |    sha256($norm) AS h
       |  FROM documents),
       |d1 AS (SELECT doc_id, n_chars, h,
       |    CAST(len(toks) AS BIGINT) AS n_toks,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       |    MIN(doc_id) OVER (PARTITION BY h) AS keeper
       |  FROM d0),
       |b AS (SELECT 'before' AS corpus, COUNT(*) AS n_docs,
       |    round(CAST(SUM(n_chars) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 4) AS mean_chars_r,
       |    round(CAST(SUM(n_toks) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 4) AS mean_tokens_r,
       |    round(CAST(SUM(CAST(n_types * 1000000 // n_toks
       |        AS DECIMAL(38,0))) AS DOUBLE)
       |      / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6)
       |      AS mean_ttr_r
       |  FROM d1),
       |a AS (SELECT 'after', COUNT(*),
       |    round(CAST(SUM(n_chars) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 4),
       |    round(CAST(SUM(n_toks) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 4),
       |    round(CAST(SUM(CAST(n_types * 1000000 // n_toks
       |        AS DECIMAL(38,0))) AS DOUBLE)
       |      / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6)
       |  FROM d1 WHERE doc_id = keeper)
       |SELECT * FROM b UNION ALL SELECT * FROM a
       |ORDER BY corpus""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "d_modality_agreement" -> dModalityAgreement,
    "s32_rle_advisor" -> s32RleAdvisor,
    "d_dedup_bias" -> dDedupBias)

  val oracleSql: Map[String, String] = Map(
    "d_modality_agreement" -> dModalityAgreementSql,
    "s32_rle_advisor" -> s32RleAdvisorSql,
    "d_dedup_bias" -> dDedupBiasSql)
}
