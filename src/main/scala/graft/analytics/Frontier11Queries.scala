package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 fifteenth-session widening: internal cluster validation
  * (Davies–Bouldin index over the k-means fit — "are these clusters
  * real?"), token-budget waterfilling (the fair-allocation step when
  * a training mix must cap every source to hit a global budget), and
  * the bitwise function surface (popcount/AND/OR/XOR folds — hash
  * diagnostics and bitmap bookkeeping).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs, windows
  * only over domain-bounded state, total ORDER BYs.
  */
object Frontier11Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // ml_cluster_quality — Davies–Bouldin validation of the k-means
  // fit (graft.ml.KMeans, the ml_kmeans_embed model): per cluster,
  // the mean point-to-centroid distance s_i (each point's distance
  // is ONE rounded double frozen as DECIMAL so the mean is exact);
  // between clusters, centroid separations d_ij from exact decimal
  // sums; then R_ij = (s_i + s_j)/d_ij and the index is the mean of
  // each cluster's worst R. Every post-assignment aggregate runs on
  // k- or k²-bounded state. DB < 1 ⇒ compact, well-separated
  // clusters; the entry reports per-cluster dispersion, worst
  // confusion partner, and the global index.
  // ------------------------------------------------------------------
  private val mlClusterQuality: QFn = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val pts = graft.ml.KMeans.pointsLong(emb).localCheckpoint(true)
    val cent = graft.ml.KMeans.fit(emb, pts, k = 8, iters = 3)
    val asg = graft.ml.KMeans.assign(pts, cent)
    val sI = asg
      .select(col("cid"), round(sqrt(col("d2").cast("double")), 6)
        .cast(DecimalType(18, 6)).as("dv"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("dv")).cast("double") / count(lit(1)), 6)
          .cast(DecimalType(18, 6)).as("s_i"))
    val ci = cent.select(col("cid").as("ci"), col("dim"),
      col("cd").as("cdi"))
    val cj = cent.select(col("cid").as("cj"), col("dim"),
      col("cd").as("cdj"))
    val sep = (col("cdi") - col("cdj")).cast(DecimalType(12, 6))
    val dij = ci.join(cj, "dim").filter(col("ci") =!= col("cj"))
      .withColumn("sq", sep * sep)
      .groupBy("ci", "cj").agg(sum(col("sq")).as("dd"))
      .select(col("ci"), col("cj"),
        round(sqrt(col("dd").cast("double")), 6).as("d_ij"))
    val rij = dij
      .join(broadcast(sI.select(col("cid").as("ci"), col("s_i"))), "ci")
      .join(broadcast(sI.select(col("cid").as("cj"),
        col("s_i").as("s_j"))), "cj")
      .select(col("ci"), col("cj"),
        round((col("s_i") + col("s_j")).cast("double") / col("d_ij"), 6)
          .as("r_ij"))
    val worst = rij
      .withColumn("rn", row_number().over(Window.partitionBy("ci")
        .orderBy(col("r_ij").desc, col("cj").asc)))
      .filter(col("rn") === 1)
      .select(col("ci").as("cid"), col("cj").as("worst_partner"),
        col("r_ij").cast(DecimalType(18, 6)).as("r_max"))
    val db = worst.agg(round(sum(col("r_max")).cast("double") /
      count(lit(1)), 6).as("db_index_r"))
    sI.join(worst, "cid").crossJoin(broadcast(db))
      .select(col("cid"), col("n_vecs"),
        col("s_i").cast("string").cast("double").as("s_r"),
        col("worst_partner"),
        col("r_max").cast("string").cast("double").as("r_max_r"),
        col("db_index_r"))
      .orderBy("cid")
  }
  private val mlClusterQualitySql =
    s"""WITH ${graft.ml.KMeans.sqlCtes(dim = 64, k = 8, iters = 3)},
       |si AS (SELECT cid, COUNT(*) AS n_vecs,
       |    CAST(round(CAST(CAST(SUM(CAST(round(sqrt(
       |      CAST(CAST(d2 AS VARCHAR) AS DOUBLE)), 6) AS DECIMAL(18,6)))
       |      AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS s_i
       |  FROM a4 GROUP BY 1),
       |dij AS (SELECT a.cid AS ci, b.cid AS cj,
       |    round(sqrt(CAST(CAST(SUM(
       |      CAST(a.cd - b.cd AS DECIMAL(12,6))
       |      * CAST(a.cd - b.cd AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE)),
       |      6) AS d_ij
       |  FROM c3 a JOIN c3 b USING (dim)
       |  WHERE a.cid <> b.cid GROUP BY 1, 2),
       |rij AS (SELECT d.ci, d.cj,
       |    round(CAST(CAST(si1.s_i + si2.s_i AS VARCHAR) AS DOUBLE)
       |      / d.d_ij, 6) AS r_ij
       |  FROM dij d JOIN si si1 ON si1.cid = d.ci
       |  JOIN si si2 ON si2.cid = d.cj),
       |worst AS (SELECT ci AS cid, cj AS worst_partner,
       |    CAST(r_ij AS DECIMAL(18,6)) AS r_max
       |  FROM rij
       |  QUALIFY row_number() OVER (PARTITION BY ci
       |    ORDER BY r_ij DESC, cj) = 1),
       |db AS (SELECT round(CAST(CAST(SUM(r_max) AS VARCHAR) AS DOUBLE)
       |    / COUNT(*), 6) AS db_index_r FROM worst)
       |SELECT si.cid, CAST(si.n_vecs AS BIGINT) AS n_vecs,
       |  CAST(CAST(si.s_i AS VARCHAR) AS DOUBLE) AS s_r,
       |  worst.worst_partner,
       |  CAST(CAST(worst.r_max AS VARCHAR) AS DOUBLE) AS r_max_r,
       |  db.db_index_r
       |FROM si JOIN worst USING (cid) CROSS JOIN db
       |ORDER BY si.cid""".stripMargin

  // ------------------------------------------------------------------
  // p_budget_waterfill — fair token-budget allocation across sources
  // (waterfilling): given a global budget B (here half the corpus),
  // find the water level c with Σ min(tokens_i, c) = B and cap every
  // source at ⌊c⌋ — small sources keep everything, large sources are
  // equalized, exactly the cap rule used when rebalancing a training
  // mix under a token budget. The corpus pass is one per-source
  // token sum; the level solve is a prefix-sum scan over the
  // SOURCE-bounded table (the k-th row where
  // prefix(k) + (n−k)·t_k ≥ B pins the level in closed form — no
  // iteration). Allocations are exact BIGINTs.
  // ------------------------------------------------------------------
  private val pBudgetWaterfill: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(TF.wsTokenCount(col("text")).cast("long")).as("tk"))
    val tot = toks.agg(floor(sum(col("tk")) / 2).cast("long").as("b"))
    val w = Window.orderBy(col("tk").asc, col("source").asc)
    val wAll = Window.partitionBy(lit(0))
    val ranked = toks.crossJoin(broadcast(tot))
      .withColumn("rn", row_number().over(w))
      .withColumn("prefix", sum(col("tk")).over(w
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
    val kstar = ranked
      .withColumn("feasible",
        col("prefix") + (col("n") - col("rn")) * col("tk") >= col("b"))
      .withColumn("kstar",
        min(when(col("feasible"), col("rn"))).over(wAll))
    val level = kstar.filter(col("rn") === col("kstar"))
      .select(round((col("b") - (col("prefix") - col("tk")))
        .cast("double") / (col("n") - col("rn") + 1).cast("double"), 6)
        .as("level_r"))
    kstar.crossJoin(broadcast(level))
      .select(col("source"), col("tk").as("tokens"),
        least(col("tk"), floor(col("level_r")).cast("long")).as("alloc"),
        col("level_r"))
      .orderBy("source")
  }
  private val pBudgetWaterfillSql = {
    val tk = TF.wsTokenCountSql("text")
    s"""WITH toks AS (SELECT source,
       |    CAST(SUM(CAST($tk AS BIGINT)) AS BIGINT) AS tk
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(floor(SUM(tk) / 2) AS BIGINT) AS b FROM toks),
       |ranked AS (SELECT source, tk, b,
       |    CAST(row_number() OVER (ORDER BY tk, source) AS BIGINT) AS rn,
       |    SUM(tk) OVER (ORDER BY tk, source) AS prefix,
       |    COUNT(*) OVER () AS n
       |  FROM toks CROSS JOIN tot),
       |ks AS (SELECT *,
       |    MIN(CASE WHEN prefix + (n - rn) * tk >= b THEN rn END)
       |      OVER () AS kstar
       |  FROM ranked),
       |lvl AS (SELECT round(CAST(b - (prefix - tk) AS DOUBLE)
       |      / CAST(n - rn + 1 AS DOUBLE), 6) AS level_r
       |  FROM ks WHERE rn = kstar)
       |SELECT ks.source, ks.tk AS tokens,
       |  least(ks.tk, CAST(floor(lvl.level_r) AS BIGINT)) AS alloc,
       |  lvl.level_r
       |FROM ks CROSS JOIN lvl
       |ORDER BY ks.source""".stripMargin
  }

  // ------------------------------------------------------------------
  // f_bitwise_pack — the bitwise function surface, folded per order
  // status: popcount totals, AND/OR/XOR aggregate folds over the
  // low key byte, and a masked-shift checksum. All exact integer
  // arithmetic (the XOR fold is order-insensitive — a distributed
  // aggregate by construction); completes the scalar-function
  // inventory next to the string/date/math/hash packs.
  // ------------------------------------------------------------------
  private val fBitwisePack: QFn = (s, dir) => {
    val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
      col("o_orderkey").as("k"))
    o.groupBy("st")
      .agg(count(lit(1)).as("n"),
        sum(bit_count(col("k"))).cast("long").as("pop_total"),
        expr("bit_xor(k)").cast("long").as("xor_fold"),
        expr("bit_and(k & 255)").cast("long").as("and_low"),
        expr("bit_or(k & 255)").cast("long").as("or_low"),
        sum(shiftleft(col("k").bitwiseAND(65535), 3)).cast("long")
          .as("shift_sum"))
      .orderBy("st")
  }
  private val fBitwisePackSql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
      |  CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS pop_total,
      |  CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_fold,
      |  CAST(bit_and(o_orderkey & 255) AS BIGINT) AS and_low,
      |  CAST(bit_or(o_orderkey & 255) AS BIGINT) AS or_low,
      |  CAST(SUM((o_orderkey & 65535) << 3) AS BIGINT) AS shift_sum
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ml_cluster_quality" -> mlClusterQuality,
    "p_budget_waterfill" -> pBudgetWaterfill,
    "f_bitwise_pack" -> fBitwisePack)

  val oracleSql: Map[String, String] = Map(
    "ml_cluster_quality" -> mlClusterQualitySql,
    "p_budget_waterfill" -> pBudgetWaterfillSql,
    "f_bitwise_pack" -> fBitwisePackSql)
}
