package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-first pack: hard-negative mining for
  * embedding training (per probe, the most similar OTHER-label
  * vectors — the pairs a contrastive loss learns most from, and the
  * margin-to-positive gap that predicts how hard), tokenizer
  * fertility (symbols-per-word after BPE merges, per language — the
  * compression report a tokenizer review reads), and per-user
  * activity bitmaps (days-of-month packed into one BIGINT per
  * month: popcount-dense retention math, AND-mask month-over-month
  * persistence — the bitmap engine pattern behind fast DAU/retention
  * serving).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier33Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // ann_hard_negatives — contrastive mining: for 5 md5-chosen probe
  // vectors, the top-3 most-cosine-similar vectors with a DIFFERENT
  // label (hard negatives) plus the best same-label similarity (the
  // positive anchor), and the margin between them. A negative
  // margin (hard negative beats the best positive) marks exactly
  // the probes a contrastive epoch would move most. Cosine runs on
  // the frozen-decimal dims (exact dots/norms, ONE rounded double
  // per pair — the ann_range_search discipline); ranking is a
  // bounded per-probe window.
  // ------------------------------------------------------------------
  private val annHardNegatives: QFn = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val pts = graft.ml.KMeans.pointsLong(emb).localCheckpoint(true)
    val labels = emb.select(col("vec_id"), col("label"))
    val probes = graft.operators.TopK.rankTopK(
        emb.select(col("vec_id"),
          md5(concat(lit("hn:"), col("vec_id").cast("string"))).as("h")),
        5, Seq(col("h").asc, col("vec_id").asc), "prnk")
      .select(col("vec_id").as("qid"))
    val qpts = pts.join(broadcast(probes), col("vec_id") === col("qid"))
      .select(col("qid"), col("dim"), col("vd").as("qd"))
    val norms = pts.groupBy("vec_id")
      .agg(sum((col("vd") * col("vd")).cast(DecimalType(38, 12)))
        .as("x2")).localCheckpoint(true)
    val cos = pts.join(qpts, "dim")
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum((col("vd") * col("qd")).cast(DecimalType(38, 12)))
        .as("dot"))
      .join(norms, "vec_id")
      .join(broadcast(norms.select(col("vec_id").as("qid"),
        col("x2").as("q2"))), "qid")
      .select(col("qid"), col("vec_id"),
        round(col("dot").cast("double") /
          sqrt(col("x2").cast("double") * col("q2").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("cos"))
      .join(labels.select(col("vec_id"), col("label").as("xl")),
        "vec_id")
      .join(broadcast(labels.select(col("vec_id").as("qid"),
        col("label").as("ql"))), "qid")
      .localCheckpoint(true)
    val bestPos = cos.filter(col("xl") === col("ql"))
      .groupBy("qid").agg(max(col("cos")).as("best_pos"))
    val wNeg = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id").asc)
    cos.filter(col("xl") =!= col("ql"))
      .withColumn("rnk", row_number().over(wNeg))
      .filter(col("rnk") <= 3)
      .join(broadcast(bestPos), "qid")
      .select(col("qid"), col("rnk"), col("vec_id").as("neg_id"),
        col("cos").cast("string").as("neg_cos"),
        col("best_pos").cast("string").as("best_pos_cos"),
        (col("best_pos") - col("cos")).cast("string").as("margin"))
      .orderBy("qid", "rnk")
  }
  private val annHardNegativesSql =
    """WITH pts AS (SELECT vec_id, dim - 1 AS dim,
      |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) AS dim
      |    FROM embeddings)),
      |pr AS (SELECT vec_id AS qid FROM (SELECT vec_id,
      |      md5('hn:' || CAST(vec_id AS VARCHAR)) AS h
      |    FROM embeddings)
      |  QUALIFY rank() OVER (ORDER BY h, vec_id) <= 5),
      |qp AS (SELECT pr.qid, p.dim, p.vd AS qd
      |  FROM pts p JOIN pr ON pr.qid = p.vec_id),
      |norms AS (SELECT vec_id,
      |    SUM(CAST(vd * vd AS DECIMAL(38,12))) AS x2
      |  FROM pts GROUP BY 1),
      |cos AS (SELECT d.qid, d.vec_id,
      |    CAST(round(CAST(d.dot AS DOUBLE)
      |      / sqrt(CAST(nx.x2 AS DOUBLE) * CAST(nq.x2 AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS cos,
      |    lx.label AS xl, lq.label AS ql
      |  FROM (SELECT q.qid, p.vec_id,
      |      SUM(CAST(p.vd * q.qd AS DECIMAL(38,12))) AS dot
      |    FROM pts p JOIN qp q ON q.dim = p.dim
      |    WHERE p.vec_id <> q.qid GROUP BY 1, 2) d
      |  JOIN norms nx ON nx.vec_id = d.vec_id
      |  JOIN norms nq ON nq.vec_id = d.qid
      |  JOIN embeddings lx ON lx.vec_id = d.vec_id
      |  JOIN embeddings lq ON lq.vec_id = d.qid),
      |bp AS (SELECT qid, MAX(cos) AS best_pos FROM cos
      |  WHERE xl = ql GROUP BY 1),
      |neg AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY cos DESC, vec_id) AS rnk
      |  FROM cos WHERE xl <> ql)
      |SELECT neg.qid, CAST(neg.rnk AS INT) AS rnk,
      |  neg.vec_id AS neg_id,
      |  CAST(neg.cos AS VARCHAR) AS neg_cos,
      |  CAST(bp.best_pos AS VARCHAR) AS best_pos_cos,
      |  CAST(bp.best_pos - neg.cos AS VARCHAR) AS margin
      |FROM neg JOIN bp ON bp.qid = neg.qid
      |WHERE neg.rnk <= 3
      |ORDER BY neg.qid, neg.rnk""".stripMargin

  // ------------------------------------------------------------------
  // t_tokenizer_fertility — compression report for the 3-merge BPE
  // vocabulary (t_bpe_merges' merge table, rebuilt inline): per
  // language, mean symbols-per-word BEFORE (characters) and AFTER
  // the merges, and the compression ratio — fertility is THE number
  // a tokenizer review reads (high fertility on a language = that
  // language pays more FLOPs per word). Token counts are exact
  // integers; merges replay the replace projection; per-language
  // means are exact sums ÷ counts, ONE rounded double each.
  // ------------------------------------------------------------------
  private val tTokenizerFertility: QFn = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(col("lang"),
        explode(split(TF.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val vocab = words.groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"), array_join(split(col("w"), ""), " ").as("sym"),
        col("f"))
      .localCheckpoint(true)
    def topPair(v: DataFrame): DataFrame = v
      .select(col("w"), col("f"), posexplode(split(col("sym"), " "))
        .as(Seq("i", "a")))
      .withColumn("b", lead(col("a"), 1).over(
        Window.partitionBy("w").orderBy("i")))
      .filter(col("b").isNotNull)
      .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
      .withColumn("rk", row_number().over(Window.orderBy(
        col("cnt").desc, col("a").asc, col("b").asc)))
      .filter(col("rk") === 1).select(col("a"), col("b"))
    def merge(v: DataFrame, top: DataFrame): DataFrame =
      v.crossJoin(broadcast(top))
        .select(col("w"),
          expr("replace(sym, a || ' ' || b, a || b)").as("sym"),
          col("f"))
    val v3 = {
      val t1 = topPair(vocab).localCheckpoint(true)
      val v2 = merge(vocab, t1).localCheckpoint(true)
      val t2 = topPair(v2).localCheckpoint(true)
      val vv = merge(v2, t2).localCheckpoint(true)
      val t3 = topPair(vv).localCheckpoint(true)
      merge(vv, t3).localCheckpoint(true)
    }
    val sized = v3.select(col("w"),
      (size(split(col("sym"), " "))).cast("long").as("n_sym"),
      length(col("w")).cast("long").as("n_chars"))
    words.join(sized, "w")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_sym")).as("sum_syms"))
      .select(col("lang"), col("n_words"),
        round(col("sum_chars").cast("double") /
          col("n_words").cast("double"), 6).as("chars_per_word_r"),
        round(col("sum_syms").cast("double") /
          col("n_words").cast("double"), 6).as("fertility_r"),
        round(col("sum_syms").cast("double") /
          col("sum_chars").cast("double"), 6).as("compression_r"))
      .orderBy("lang")
  }
  private val tTokenizerFertilitySql = {
    val norm = TF.normTextSql("text")
    def top(v: String, n: Int): String =
      s"""p$n AS (SELECT a, b FROM (SELECT a, b, SUM(f) AS cnt FROM (
         |  SELECT f, s AS a,
         |      lead(s) OVER (PARTITION BY w ORDER BY i) AS b
         |  FROM (SELECT w, f, unnest(string_split(sym, ' ')) AS s,
         |      generate_subscripts(string_split(sym, ' '), 1) AS i
         |    FROM $v))
         |  WHERE b IS NOT NULL GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (ORDER BY cnt DESC, a, b) = 1)"""
        .stripMargin
    s"""WITH wl AS (SELECT lang, unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |words AS (SELECT lang, w FROM wl WHERE length(w) > 0),
       |vocab0 AS (SELECT w, COUNT(*) AS f FROM words GROUP BY 1),
       |v1 AS (SELECT w,
       |    array_to_string(string_split_regex(w, ''), ' ') AS sym, f
       |  FROM vocab0),
       |${top("v1", 1)},
       |v2 AS (SELECT v1.w, replace(v1.sym, p1.a || ' ' || p1.b,
       |    p1.a || p1.b) AS sym, v1.f FROM v1 CROSS JOIN p1),
       |${top("v2", 2)},
       |v3 AS (SELECT v2.w, replace(v2.sym, p2.a || ' ' || p2.b,
       |    p2.a || p2.b) AS sym, v2.f FROM v2 CROSS JOIN p2),
       |${top("v3", 3)},
       |v4 AS (SELECT v3.w, replace(v3.sym, p3.a || ' ' || p3.b,
       |    p3.a || p3.b) AS sym, v3.f FROM v3 CROSS JOIN p3),
       |sized AS (SELECT w,
       |    CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym,
       |    CAST(length(w) AS BIGINT) AS n_chars
       |  FROM v4)
       |SELECT lang, COUNT(*) AS n_words,
       |  round(CAST(SUM(n_chars) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS chars_per_word_r,
       |  round(CAST(SUM(n_sym) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS fertility_r,
       |  round(CAST(SUM(n_sym) AS DOUBLE)
       |    / CAST(SUM(n_chars) AS DOUBLE), 6) AS compression_r
       |FROM words JOIN sized USING (w)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // ev_activity_bitmap — bitmap retention engine at WEEK grain
  // (the one-month synthetic stream holds ~5 weeks): each user-week
  // packs its active DAYS-OF-WEEK into one BIGINT (bit d set =
  // active that weekday — bit_or of per-event masks, a mergeable
  // aggregate that shuffles 8 bytes per user-week no matter how
  // many events), then popcount gives active-day counts and the AND
  // of consecutive weeks' masks counts SAME-WEEKDAY persistence
  // (the habit signal plain retention misses). Reported per week:
  // users, mean active days, and the habitual-user count.
  // ------------------------------------------------------------------
  private val evActivityBitmap: QFn = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .select(col("user_id"), (col("day") / 7).cast("long").as("wk"),
        (col("day") % 7).cast("int").as("dow"))
    val masks = e.groupBy("user_id", "wk")
      .agg(expr("bit_or(shiftleft(1L, dow))").as("mask"))
      .localCheckpoint(true)
    val wSeq = Window.partitionBy("user_id").orderBy("wk")
    val withPrev = masks
      .withColumn("prev_mask", lag(col("mask"), 1).over(wSeq))
      .withColumn("prev_wk", lag(col("wk"), 1).over(wSeq))
    withPrev.groupBy("wk")
      .agg(count(lit(1)).as("n_users"),
        sum(expr("bit_count(mask)")).cast("long").as("active_days"),
        sum(when(col("prev_wk") === col("wk") - 1,
          expr("bit_count(mask & prev_mask)"))).cast("long")
          .as("same_dow_overlap"),
        sum(when(col("prev_wk") === col("wk") - 1 &&
          expr("bit_count(mask & prev_mask)") >= 2, 1L).otherwise(0L))
          .cast("long").as("n_habitual"))
      .select(col("wk"), col("n_users"),
        round(col("active_days").cast("double") /
          col("n_users").cast("double"), 6).as("mean_active_days_r"),
        coalesce(col("same_dow_overlap"), lit(0L))
          .as("same_dow_overlap"),
        col("n_habitual"))
      .orderBy("wk")
  }
  private val evActivityBitmapSql =
    """WITH e AS (SELECT user_id,
      |    (epoch_us(ts) // 86400000000) // 7 AS wk,
      |    CAST((epoch_us(ts) // 86400000000) % 7 AS INT) AS dow
      |  FROM events),
      |m AS (SELECT user_id, wk,
      |    bit_or(CAST(1 AS BIGINT) << dow) AS mask
      |  FROM e GROUP BY 1, 2),
      |p AS (SELECT user_id, wk, mask,
      |    lag(mask) OVER w AS prev_mask,
      |    lag(wk) OVER w AS prev_wk
      |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY wk))
      |SELECT wk, COUNT(*) AS n_users,
      |  round(CAST(SUM(bit_count(mask)) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_active_days_r,
      |  COALESCE(CAST(SUM(CASE WHEN prev_wk = wk - 1
      |    THEN bit_count(mask & prev_mask) END) AS BIGINT), 0)
      |    AS same_dow_overlap,
      |  CAST(SUM(CASE WHEN prev_wk = wk - 1
      |    AND bit_count(mask & prev_mask) >= 2 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_habitual
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ann_hard_negatives" -> annHardNegatives,
    "t_tokenizer_fertility" -> tTokenizerFertility,
    "ev_activity_bitmap" -> evActivityBitmap)

  val oracleSql: Map[String, String] = Map(
    "ann_hard_negatives" -> annHardNegativesSql,
    "t_tokenizer_fertility" -> tTokenizerFertilitySql,
    "ev_activity_bitmap" -> evActivityBitmapSql)
}
