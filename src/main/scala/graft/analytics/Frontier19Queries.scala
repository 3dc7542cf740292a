package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, seventh pack: held-out bigram perplexity (the
  * train/eval split discipline every LM-quality filter needs — score
  * text with a model fit on DIFFERENT text), HITS hubs-and-
  * authorities on the customer→part bipartite graph (Kleinberg 1999
  * — the two-sided importance ranking next to g_pagerank's one-
  * sided), and maximum-inner-product search via the MIPS→L2
  * reduction (Bachrach et al. 2014 — rank by ‖q‖²+M²−2⟨q,x⟩ and the
  * augmented nearest neighbor IS the inner-product argmax, no sqrt
  * ever taken).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier19Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_perplexity_eval — held-out perplexity of an add-one-smoothed
  // bigram LM: TRAIN on even doc_ids, EVALUATE on odd doc_ids —
  // scoring text with a model fit on different text is what makes
  // the number an honest quality signal (in-sample likelihood, the
  // t_bigram_lm entry, always flatters). Smoothed probabilities
  // P(w2|w1) = (c₂+1)/(c₁+V) over the train vocabulary V; an eval
  // bigram whose context w1 the model never saw backs off to 1/V.
  // Each distinct eval bigram's ln P is ONE rounded double frozen as
  // DECIMAL(18,6) and weighted by its exact count, so per-language
  // sums are order-free; perplexity exp(−LL/N) is the single final
  // double. Counts join on bigram keys — corpus-linear, the V scalar
  // broadcasts.
  // ------------------------------------------------------------------
  private val tPerplexityEval: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        posexplode(split(TF.normText(col("text")), " "))
          .as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val big = toks.select(col("doc_id"), col("lang"), col("i"),
        col("w").as("w1"))
      .join(toks.select(col("doc_id"), (col("i") - 1).as("i"),
        col("w").as("w2")), Seq("doc_id", "i"))
    val train = big.filter(col("doc_id") % 2 === 0)
    val evalB = big.filter(col("doc_id") % 2 === 1)
    val c2 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").cast("long").as("c1"))
    val v = toks.filter(col("doc_id") % 2 === 0)
      .select(col("w")).distinct().count() // train vocab — one scalar
    val evalCounts = evalB.groupBy("lang", "w1", "w2")
      .agg(count(lit(1)).as("m"))
    val scored = evalCounts
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .select(col("lang"), col("m"),
        (round(log(
          (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + v).cast("double")), 6)
          .cast(DecimalType(18, 6)) * col("m")).as("wll"))
    scored.groupBy("lang")
      .agg(sum(col("m")).cast("long").as("n_eval_bigrams"),
        sum(col("wll")).as("ll"))
      .select(col("lang"), col("n_eval_bigrams"),
        round(exp(negate(col("ll").cast("double") /
          col("n_eval_bigrams").cast("double"))), 4).as("ppl_r"))
      .orderBy("lang")
  }
  private val tPerplexityEvalSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, lang,
       |    unnest(string_split($norm, ' ')) AS w,
       |    generate_subscripts(string_split($norm, ' '), 1) AS i
       |  FROM documents),
       |tk AS (SELECT doc_id, lang, i, w FROM w0 WHERE length(w) > 0),
       |big AS (SELECT a.doc_id, a.lang, a.w AS w1, b.w AS w2
       |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big
       |  WHERE doc_id % 2 = 0 GROUP BY 1, 2),
       |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2
       |  GROUP BY 1),
       |vv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tk
       |  WHERE doc_id % 2 = 0),
       |ec AS (SELECT lang, w1, w2, COUNT(*) AS m FROM big
       |  WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
       |sc AS (SELECT ec.lang, ec.m,
       |    CAST(round(ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
       |      / CAST(COALESCE(c1.c1, 0) + vv.v AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) * ec.m AS wll
       |  FROM ec
       |  LEFT JOIN c2 ON c2.w1 = ec.w1 AND c2.w2 = ec.w2
       |  LEFT JOIN c1 ON c1.w1 = ec.w1
       |  CROSS JOIN vv)
       |SELECT lang, CAST(SUM(m) AS BIGINT) AS n_eval_bigrams,
       |  round(exp(-(CAST(SUM(wll) AS DOUBLE)
       |    / CAST(SUM(m) AS DOUBLE))), 4) AS ppl_r
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // g_hits — HITS on the customer→part purchase bipartite graph
  // (distinct edges from orders⋈lineitem): authorities are parts
  // that good hubs buy, hubs are customers that buy good
  // authorities. Two mutual-reinforcement rounds from hub = 1, each
  // half-step L1-normalized (exact decimal sums; every score is ONE
  // rounded double frozen as DECIMAL(18,9) so the next round's sums
  // stay order-free). Edges shuffle on their own keys — the classic
  // two-groupBy-per-iteration sparse shape, same discipline as
  // g_pagerank — and top-10 authorities emerge via the two-phase
  // rankTopK, no global sort of the part axis.
  // ------------------------------------------------------------------
  private val gHits: QFn = (s, dir) => {
    val e = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    def l1norm(df: DataFrame, key: String, raw: String): DataFrame = {
      val tot = df.agg(sum(col(raw)).as("tot"))
      df.crossJoin(broadcast(tot))
        .select(col(key),
          round(col(raw).cast("double") / col("tot").cast("double"), 9)
            .cast(DecimalType(18, 9)).as("score"))
    }
    // round 1: hub=1 → auth_raw(p) = degree; normalize both sides
    val auth1 = l1norm(e.groupBy("p").agg(count(lit(1))
      .cast(DecimalType(18, 9)).as("raw")), "p", "raw")
      .localCheckpoint(true)
    val hub1 = l1norm(e.join(auth1, "p").groupBy("c")
      .agg(sum(col("score")).as("raw")), "c", "raw")
      .localCheckpoint(true)
    // round 2
    val auth2 = l1norm(e.join(hub1.select(col("c"), col("score")
        .as("hs")), "c")
      .groupBy("p").agg(sum(col("hs")).as("raw")), "p", "raw")
      .localCheckpoint(true)
    val scored = auth2
      .select(col("p").as("l_partkey"),
        col("score").cast("string").as("authority"),
        round(col("score").cast("double"), 9).as("a_r"))
    graft.operators.TopK.rankTopK(scored, 10,
        Seq(col("a_r").desc, col("l_partkey").asc), "rnk")
      .select(col("rnk"), col("l_partkey"), col("authority"))
      .orderBy("rnk", "l_partkey")
  }
  private val gHitsSql =
    """WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |a1r AS (SELECT p, CAST(COUNT(*) AS DECIMAL(18,9)) AS raw
      |  FROM e GROUP BY 1),
      |a1 AS (SELECT p, CAST(round(CAST(raw AS DOUBLE)
      |    / CAST((SELECT SUM(raw) FROM a1r) AS DOUBLE), 9)
      |    AS DECIMAL(18,9)) AS score FROM a1r),
      |h1r AS (SELECT e.c, SUM(a1.score) AS raw
      |  FROM e JOIN a1 ON a1.p = e.p GROUP BY 1),
      |h1 AS (SELECT c, CAST(round(CAST(raw AS DOUBLE)
      |    / CAST((SELECT SUM(raw) FROM h1r) AS DOUBLE), 9)
      |    AS DECIMAL(18,9)) AS score FROM h1r),
      |a2r AS (SELECT e.p, SUM(h1.score) AS raw
      |  FROM e JOIN h1 ON h1.c = e.c GROUP BY 1),
      |a2 AS (SELECT p, CAST(round(CAST(raw AS DOUBLE)
      |    / CAST((SELECT SUM(raw) FROM a2r) AS DOUBLE), 9)
      |    AS DECIMAL(18,9)) AS score FROM a2r),
      |rk AS (SELECT CAST(rank() OVER (ORDER BY
      |      round(CAST(score AS DOUBLE), 9) DESC, p) AS INT) AS rnk,
      |    p AS l_partkey, CAST(score AS VARCHAR) AS authority
      |  FROM a2)
      |SELECT rnk, l_partkey, authority FROM rk
      |WHERE rnk <= 10
      |ORDER BY rnk, l_partkey""".stripMargin

  // ------------------------------------------------------------------
  // ann_mips_topk — maximum-inner-product top-10 via the MIPS→L2
  // reduction: augmenting corpus vectors with √(M²−‖x‖²) makes the
  // L2-nearest augmented neighbor the inner-product argmax, because
  // d'² = ‖q‖² + M² − 2⟨q,x⟩ is strictly decreasing in ⟨q,x⟩. The
  // entry RANKS BY THAT AUGMENTED DISTANCE — computed entirely in
  // exact decimal (‖q‖², M², and ⟨q,x⟩ are exact sums over the
  // frozen DECIMAL(18,6) dims; the √ never needs evaluating) — while
  // the oracle ranks by raw inner product descending; the hash match
  // PROVES the reduction preserves the top-k, tie-for-tie (both
  // sides break ties on vec_id). Dot products shuffle on the dim key
  // then the (query, vector) pair — the brute-force baseline every
  // MIPS index (IVF/graph) is measured against.
  // ------------------------------------------------------------------
  private val annMipsTopk: QFn = (s, dir) => {
    val pts = graft.ml.KMeans.pointsLong(t(s, dir, "embeddings"))
      .localCheckpoint(true)
    val queries = pts.filter(col("vec_id") <= 3)
      .select(col("vec_id").as("qid"), col("dim"), col("vd").as("qd"))
    val corpus = pts.filter(col("vec_id") > 3)
    val norms = corpus
      .groupBy("vec_id")
      .agg(sum((col("vd") * col("vd")).cast(DecimalType(38, 12)))
        .as("x2"))
    val m2 = norms.agg(max(col("x2")).as("m2"))
    val qnorm = queries.groupBy("qid")
      .agg(sum((col("qd") * col("qd")).cast(DecimalType(38, 12)))
        .as("q2"))
    val dots = corpus.join(queries, "dim")
      .groupBy("qid", "vec_id")
      .agg(sum((col("vd") * col("qd")).cast(DecimalType(38, 12)))
        .as("dot"))
    // d'^2 = q2 + M2 - 2*dot — exact decimal, monotone anti in dot
    val aug = dots
      .join(broadcast(qnorm), "qid")
      .crossJoin(broadcast(m2))
      .select(col("qid"), col("vec_id"), col("dot"),
        // dot subtracted twice: keeps pure decimal addition (exact,
        // full scale-12) — a 2×decimal multiply would overflow Spark's
        // 38-digit cap and silently drop scale, breaking tie parity
        (col("q2") + col("m2") - col("dot") - col("dot")).as("d2aug"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("d2aug").asc, col("vec_id").asc)
    aug.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("rnk"), col("vec_id"),
        col("dot").cast("string").as("inner_product"))
      .orderBy("qid", "rnk")
  }
  private val annMipsTopkSql =
    """WITH pts AS (SELECT vec_id, dim - 1 AS dim,
      |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) AS dim
      |    FROM embeddings)),
      |q AS (SELECT vec_id AS qid, dim, vd AS qd FROM pts
      |  WHERE vec_id <= 3),
      |c AS (SELECT * FROM pts WHERE vec_id > 3),
      |dots AS (SELECT q.qid, c.vec_id,
      |    SUM(CAST(c.vd * q.qd AS DECIMAL(38,12))) AS dot
      |  FROM c JOIN q ON q.dim = c.dim GROUP BY 1, 2),
      |rk AS (SELECT qid, vec_id, dot,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY dot DESC, vec_id) AS rnk
      |  FROM dots)
      |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id,
      |  CAST(dot AS VARCHAR) AS inner_product
      |FROM rk WHERE rnk <= 10
      |ORDER BY qid, rnk""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_perplexity_eval" -> tPerplexityEval,
    "g_hits" -> gHits,
    "ann_mips_topk" -> annMipsTopk)

  val oracleSql: Map[String, String] = Map(
    "t_perplexity_eval" -> tPerplexityEvalSql,
    "g_hits" -> gHitsSql,
    "ann_mips_topk" -> annMipsTopkSql)
}
