package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, sixth pack: linear-SVM training epochs over the
  * embedding table (full-batch subgradient on the hinge loss — the
  * third loss family next to logreg's cross-entropy and the stumps'
  * squared error), an approximate randomization test (Noreen 1989 —
  * hash-derived label reassignments give an assumption-free p-value,
  * the two-sample test that needs no distributional model), and
  * Jensen–Shannon divergence of each source's unigram distribution
  * against the corpus (the bounded, symmetric drift measure corpus
  * mixing reports use).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL(18,6) before any reordering sum, total ORDER BYs.
  */
object Frontier18Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // ml_svm_hinge — two full-batch subgradient epochs of a linear SVM
  // (binary target: embedding label < 5) from w₀ = 0, η = 0.5,
  // λ = 0.01. Dims load through the ml.KMeans exact-decimal layout
  // (each float frozen once as DECIMAL(18,6)), so margins y·⟨w,x⟩
  // are exact decimal dot products (shuffle on vec_id — the sample
  // axis), the violator set {m < 1} is an exact comparison, and each
  // weight update w_d ← (1−ηλ)w_d + η·Σ_viol(y·x_d)/n is ONE rounded
  // double frozen back to DECIMAL(18,6) — both engines walk the
  // identical float path, epoch by epoch. Per epoch the data moves
  // twice (margin pass, gradient pass), each a key-partitioned
  // aggregation; the 64-row weight vector broadcasts. Emits per-epoch
  // violator count, training accuracy, mean hinge loss, and the L1
  // weight norm — the convergence trace a training job logs.
  // ------------------------------------------------------------------
  private val mlSvmHinge: QFn = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val pts = graft.ml.KMeans.pointsLong(emb).localCheckpoint(true)
    val y = emb.select(col("vec_id"),
      when(col("label") < 5, lit(1L)).otherwise(lit(-1L)).as("y"))
      .localCheckpoint(true)
    val n = y.count()
    def margins(w: DataFrame): DataFrame = pts
      .join(broadcast(w), "dim")
      .groupBy("vec_id").agg(sum(col("vd") * col("wd")).as("dot"))
      .join(y, "vec_id")
      .select(col("vec_id"), col("y"), col("dot"),
        (col("y") * col("dot")).as("m"))
    def update(w: DataFrame, viol: DataFrame): DataFrame = {
      // Σ_viol y·x_d per dim (exact decimal), then one rounded double
      val g = pts.join(viol.select(col("vec_id"), col("y")), "vec_id")
        .groupBy("dim").agg(sum(col("vd") * col("y")).as("gsum"))
      w.join(g, Seq("dim"), "left")
        .select(col("dim"),
          round(col("wd").cast("double") * (1.0 - 0.5 * 0.01) +
            lit(0.5) * coalesce(col("gsum").cast("double"), lit(0.0)) /
              n.toDouble, 6)
            .cast(DecimalType(18, 6)).as("wd"))
    }
    val w0 = pts.select(col("dim")).distinct()
      .select(col("dim"), lit(0.0).cast(DecimalType(18, 6)).as("wd"))
    // epoch 1: every margin is 0 < 1 — all samples are violators
    val w1 = update(w0, y.select(col("vec_id"), col("y")))
      .localCheckpoint(true)
    val m1 = margins(w1).localCheckpoint(true)
    val w2 = update(w1, m1.filter(col("m") < 1)
      .select(col("vec_id"), col("y"))).localCheckpoint(true)
    val m2 = margins(w2).localCheckpoint(true)
    def epochStats(ep: Int, m: DataFrame, w: DataFrame): DataFrame = {
      val hl = m.select(col("m"),
        when(col("m") < 1, round(lit(1.0) - col("m").cast("double"), 6))
          .otherwise(lit(0.0)).cast(DecimalType(18, 6)).as("h"),
        when(col("m") > 0, 1L).otherwise(0L).as("correct"),
        when(col("m") < 1, 1L).otherwise(0L).as("viol"))
        .agg(sum(col("viol")).cast("long").as("n_violators"),
          sum(col("correct")).cast("long").as("n_correct"),
          sum(col("h")).as("sh"))
      val wn = w.agg(sum(abs(col("wd"))).as("wn1"))
      hl.crossJoin(wn)
        .select(lit(ep).as("epoch"), col("n_violators"), col("n_correct"),
          round(col("sh").cast("double") / n.toDouble, 6).as("hinge_r"),
          col("wn1").cast("string").as("w_norm1"))
    }
    epochStats(1, m1, w1).unionByName(epochStats(2, m2, w2))
      .orderBy("epoch")
  }
  private val mlSvmHingeSql = {
    // mirror of pointsLong + the two epochs; n is a scalar subquery
    s"""WITH pts AS (SELECT vec_id, dim - 1 AS dim,
       |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |      generate_subscripts(embedding, 1) AS dim
       |    FROM embeddings)),
       |yy AS (SELECT vec_id,
       |    CASE WHEN label < 5 THEN 1 ELSE -1 END AS y
       |  FROM embeddings),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM yy),
       |g1 AS (SELECT p.dim, SUM(p.vd * yy.y) AS gsum
       |  FROM pts p JOIN yy ON yy.vec_id = p.vec_id GROUP BY 1),
       |w1 AS (SELECT g1.dim,
       |    CAST(round(0.0 * (1.0 - 0.5 * 0.01)
       |      + 0.5 * CAST(CAST(g1.gsum AS VARCHAR) AS DOUBLE) / nn.n, 6)
       |      AS DECIMAL(18,6)) AS wd
       |  FROM g1, nn),
       |m1 AS (SELECT p.vec_id, yy.y, yy.y * SUM(p.vd * w1.wd) AS m
       |  FROM pts p JOIN w1 ON w1.dim = p.dim
       |  JOIN yy ON yy.vec_id = p.vec_id
       |  GROUP BY p.vec_id, yy.y),
       |g2 AS (SELECT p.dim, SUM(p.vd * m1.y) AS gsum
       |  FROM pts p JOIN m1 ON m1.vec_id = p.vec_id AND m1.m < 1
       |  GROUP BY 1),
       |w2 AS (SELECT w1.dim,
       |    CAST(round(CAST(w1.wd AS DOUBLE) * (1.0 - 0.5 * 0.01)
       |      + 0.5 * COALESCE(CAST(CAST(g2.gsum AS VARCHAR) AS DOUBLE),
       |          0.0) / nn.n, 6) AS DECIMAL(18,6)) AS wd
       |  FROM w1 LEFT JOIN g2 ON g2.dim = w1.dim, nn),
       |m2 AS (SELECT p.vec_id, yy.y, yy.y * SUM(p.vd * w2.wd) AS m
       |  FROM pts p JOIN w2 ON w2.dim = p.dim
       |  JOIN yy ON yy.vec_id = p.vec_id
       |  GROUP BY p.vec_id, yy.y),
       |e1 AS (SELECT 1 AS epoch,
       |    CAST(SUM(CASE WHEN m < 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_violators,
       |    CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct,
       |    round(CAST(SUM(CAST(CASE WHEN m < 1 THEN
       |        round(1.0 - CAST(m AS DOUBLE), 6) ELSE 0.0 END
       |        AS DECIMAL(18,6))) AS DOUBLE) / ANY_VALUE(nn.n), 6)
       |      AS hinge_r,
       |    (SELECT CAST(SUM(abs(wd)) AS VARCHAR) FROM w1) AS w_norm1
       |  FROM m1, nn),
       |e2 AS (SELECT 2 AS epoch,
       |    CAST(SUM(CASE WHEN m < 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_violators,
       |    CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct,
       |    round(CAST(SUM(CAST(CASE WHEN m < 1 THEN
       |        round(1.0 - CAST(m AS DOUBLE), 6) ELSE 0.0 END
       |        AS DECIMAL(18,6))) AS DOUBLE) / ANY_VALUE(nn.n), 6)
       |      AS hinge_r,
       |    (SELECT CAST(SUM(abs(wd)) AS VARCHAR) FROM w2) AS w_norm1
       |  FROM m2, nn)
       |SELECT * FROM e1 UNION ALL SELECT * FROM e2 ORDER BY epoch""".stripMargin
  }

  // ------------------------------------------------------------------
  // a42_permutation_test — approximate randomization test for the
  // BUILDING-vs-AUTOMOBILE mean order price gap: 20 pseudo-random
  // label reassignments, each order's replica-k group drawn from the
  // md5 of (k, orderkey) — fully deterministic, coordination-free,
  // and embarrassingly parallel (the 20 replicas ride ONE explode of
  // the scan; everything then aggregates by replica — no data moves
  // twice). The p-value is (1 + #{|Δ_k| ≥ |Δ_obs|}) / (K+1), the
  // add-one estimator that keeps p valid for any K. Group means use
  // exact decimal sums; each |Δ| is ONE rounded double frozen as
  // DECIMAL(18,6) so the ≥ comparison is exact in both engines.
  // ------------------------------------------------------------------
  private val a42PermutationTest: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("tp"))
      .localCheckpoint(true)
    def diffOf(df: DataFrame, grpCol: String): DataFrame = df
      .groupBy(col("rep"), col(grpCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(col("tp")).as("sg"))
      .groupBy("rep")
      .agg(
        max(when(col("g") === "BUILDING", col("sg"))).as("sa"),
        max(when(col("g") === "BUILDING", col("ng"))).as("na"),
        max(when(col("g") =!= "BUILDING", col("sg"))).as("sb"),
        max(when(col("g") =!= "BUILDING", col("ng"))).as("nb"))
      .select(col("rep"),
        round(abs(col("sa").cast("double") / col("na").cast("double") -
          col("sb").cast("double") / col("nb").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("d"))
    val obs = diffOf(o.withColumn("rep", lit(-1)), "seg")
      .select(col("d").as("obs_d"))
    val perms = o.select(col("o_orderkey"), col("tp"),
        explode(sequence(lit(0), lit(19))).as("rep"))
      .withColumn("pg",
        when(conv(substring(md5(concat(col("rep").cast("string"),
          lit(":"), col("o_orderkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2 === 0, lit("BUILDING"))
          .otherwise(lit("OTHER")))
    val permD = diffOf(perms, "pg")
    permD.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("k"),
        sum(when(col("d") >= col("obs_d"), 1L).otherwise(0L))
          .cast("long").as("n_ge"),
        max(col("obs_d")).cast("string").as("obs_diff"))
      .select(col("k"), col("n_ge"), col("obs_diff"),
        round((col("n_ge") + 1).cast("double") /
          (col("k") + 1).cast("double"), 6).as("p_r"))
  }
  private val a42PermutationTestSql =
    """WITH o AS (SELECT o_orderkey, c_mktsegment AS seg,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS tp
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |obs0 AS (SELECT
      |    SUM(CASE WHEN seg = 'BUILDING' THEN tp END) AS sa,
      |    COUNT(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    SUM(CASE WHEN seg <> 'BUILDING' THEN tp END) AS sb,
      |    COUNT(CASE WHEN seg <> 'BUILDING' THEN 1 END) AS nb
      |  FROM o),
      |obs AS (SELECT CAST(round(abs(
      |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
      |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)), 6)
      |    AS DECIMAL(18,6)) AS obs_d FROM obs0),
      |reps AS (SELECT o.o_orderkey, o.tp, r.rep,
      |    CASE WHEN CAST(('0x' || substring(md5(CAST(r.rep AS VARCHAR)
      |        || ':' || CAST(o.o_orderkey AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 2 = 0
      |    THEN 'BUILDING' ELSE 'OTHER' END AS pg
      |  FROM o CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS rep)
      |    r),
      |pd0 AS (SELECT rep,
      |    SUM(CASE WHEN pg = 'BUILDING' THEN tp END) AS sa,
      |    COUNT(CASE WHEN pg = 'BUILDING' THEN 1 END) AS na,
      |    SUM(CASE WHEN pg <> 'BUILDING' THEN tp END) AS sb,
      |    COUNT(CASE WHEN pg <> 'BUILDING' THEN 1 END) AS nb
      |  FROM reps GROUP BY 1),
      |pd AS (SELECT rep, CAST(round(abs(
      |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
      |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)), 6)
      |    AS DECIMAL(18,6)) AS d FROM pd0)
      |SELECT COUNT(*) AS k,
      |  CAST(SUM(CASE WHEN pd.d >= obs.obs_d THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ge,
      |  CAST(MAX(obs.obs_d) AS VARCHAR) AS obs_diff,
      |  round(CAST(SUM(CASE WHEN pd.d >= obs.obs_d THEN 1 ELSE 0 END)
      |      + 1 AS DOUBLE) / CAST(COUNT(*) + 1 AS DOUBLE), 6) AS p_r
      |FROM pd CROSS JOIN obs""".stripMargin

  // ------------------------------------------------------------------
  // t_js_divergence — Jensen–Shannon divergence of each source's
  // unigram distribution from the corpus-wide distribution:
  // JSD = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2, the symmetric,
  // √-metrizable, [0, ln2]-bounded drift measure. Probabilities are
  // frequency ratios frozen at DECIMAL(18,9); every KL term
  // (p/2)·ln(p/m) is ONE rounded double frozen as DECIMAL(18,6) so
  // per-source sums are exact. The (source × vocabulary) grid comes
  // from a vocab-side join — Q terms missing from a source still
  // contribute (their p = 0 leg vanishes, the q leg keeps mass), and
  // everything shuffles on the term key; Heaps' law keeps the grid
  // sublinear in corpus size.
  // ------------------------------------------------------------------
  private val tJsDivergence: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(split(TF.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true)
    val srcTot = toks.groupBy("source").agg(count(lit(1)).as("nt"))
    val srcTerm = toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val glob = toks.groupBy("w").agg(count(lit(1)).as("gc"))
    val gtot = toks.count()
    // vocab × source grid: global vocabulary joined to every source
    val grid = glob.crossJoin(broadcast(srcTot))
      .join(srcTerm, Seq("source", "w"), "left")
      .select(col("source"), col("w"), col("nt"),
        round(coalesce(col("c"), lit(0L)).cast("double") /
          col("nt").cast("double"), 9).cast(DecimalType(18, 9)).as("p"),
        round(col("gc").cast("double") / lit(gtot.toDouble), 9)
          .cast(DecimalType(18, 9)).as("q"))
    val terms = grid.select(col("source"), col("nt"),
      (when(col("p") > 0,
        round((col("p").cast("double") / 2.0) *
          log(col("p").cast("double") /
            ((col("p") + col("q")).cast("double") / 2.0)), 6))
        .otherwise(lit(0.0)) +
       round((col("q").cast("double") / 2.0) *
         log(col("q").cast("double") /
           ((col("p") + col("q")).cast("double") / 2.0)), 6))
        .cast(DecimalType(18, 6)).as("term"))
    terms.groupBy("source")
      .agg(max(col("nt")).cast("long").as("n_tokens"),
        round(sum(col("term")).cast("double"), 6).as("jsd_r"))
      .orderBy("source")
  }
  private val tJsDivergenceSql = {
    val norm = TF.normTextSql("text")
    s"""WITH tk AS (SELECT source, unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |toks AS (SELECT source, w FROM tk WHERE length(w) > 0),
       |st AS (SELECT source, COUNT(*) AS nt FROM toks GROUP BY 1),
       |sw AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |gl AS (SELECT w, COUNT(*) AS gc FROM toks GROUP BY 1),
       |gt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
       |grid AS (SELECT st.source, gl.w, st.nt,
       |    CAST(round(CAST(COALESCE(sw.c, 0) AS DOUBLE)
       |      / CAST(st.nt AS DOUBLE), 9) AS DECIMAL(18,9)) AS p,
       |    CAST(round(CAST(gl.gc AS DOUBLE) / gt.n, 9)
       |      AS DECIMAL(18,9)) AS q
       |  FROM gl CROSS JOIN st CROSS JOIN gt
       |  LEFT JOIN sw ON sw.source = st.source AND sw.w = gl.w),
       |terms AS (SELECT source, nt,
       |    CAST(CASE WHEN p > 0 THEN
       |        round((CAST(p AS DOUBLE) / 2.0)
       |          * ln(CAST(p AS DOUBLE)
       |            / (CAST(p + q AS DOUBLE) / 2.0)), 6)
       |      ELSE 0.0 END
       |      + round((CAST(q AS DOUBLE) / 2.0)
       |          * ln(CAST(q AS DOUBLE)
       |            / (CAST(p + q AS DOUBLE) / 2.0)), 6)
       |      AS DECIMAL(18,6)) AS term
       |  FROM grid)
       |SELECT source, CAST(MAX(nt) AS BIGINT) AS n_tokens,
       |  round(CAST(SUM(term) AS DOUBLE), 6) AS jsd_r
       |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "ml_svm_hinge" -> mlSvmHinge,
    "a42_permutation_test" -> a42PermutationTest,
    "t_js_divergence" -> tJsDivergence)

  val oracleSql: Map[String, String] = Map(
    "ml_svm_hinge" -> mlSvmHingeSql,
    "a42_permutation_test" -> a42PermutationTestSql,
    "t_js_divergence" -> tJsDivergenceSql)
}
