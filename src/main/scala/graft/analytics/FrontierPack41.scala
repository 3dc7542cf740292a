package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

// Contents (one object per pack, APIs identical to the other packs):
//   Frontier41Queries: a61_anova_oneway, a62_effect_size, w42_holt_linear
//   Frontier42Queries: g_katz, g_label_prop, ml_pr_auc
//   Frontier43Queries: ann_sq8_topk, p_epoch_shuffle, i26_merge_delete

/** Round-7 widening, first pack: one-way ANOVA (the k-sample parametric
  * F-test the Kruskal–Wallis entry is the rank twin of), standardized
  * effect sizes (Cohen's d + Hedges' g — the "is the difference LARGE,
  * not just significant" companion every A/B readout needs next to its
  * p-value), and Holt's linear-trend double exponential smoothing (the
  * level+trend forecaster between the EWMA entry — level only — and a
  * full seasonal decomposition).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE expression over exact inputs (decimal→double
  * surfaces routed through VARCHAR where the value exceeds 2^53
  * exactness), frozen as DECIMAL before any reordering sum, total
  * ORDER BYs.
  */
object Frontier41Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a61_anova_oneway — one-way ANOVA of account balance across market
  // segments: per-group (n, Σx, Σx²) in exact decimal, the per-group
  // (Σx)²/n term frozen as round-6 DECIMAL before the k-row reordering
  // sum, then SSB/SSW/F as single double expressions over the exact
  // grand totals (VARCHAR-routed decimal→double — the sums of squares
  // run to 1e12+ where naive double casts diverge between engines).
  // Two aggregation passes over a 5-group key — trivially parallel,
  // and the F statistic itself is O(groups) driver-free arithmetic.
  // ------------------------------------------------------------------
  private val a61AnovaOneway: QFn = (s, dir) => {
    val xdec = col("c_acctbal").cast(DecimalType(18, 4))
    val g = t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(xdec).as("s"),
        sum((xdec * xdec).cast(DecimalType(38, 8))).as("q"))
      .withColumn("term",
        round((col("s").cast("string").cast("double") *
          col("s").cast("string").cast("double")) /
          col("n").cast("double"), 6).cast(DecimalType(38, 6)))
    g.agg(count(lit(1)).as("k"),
        sum(col("n")).as("nt"),
        sum(col("s")).as("ss"),
        sum(col("q")).as("qq"),
        sum(col("term")).as("tt"))
      .select(col("k").cast("long").as("k_groups"),
        col("nt").cast("long").as("n_total"),
        round(col("tt").cast("string").cast("double") -
          (col("ss").cast("string").cast("double") *
            col("ss").cast("string").cast("double")) /
            col("nt").cast("double"), 6).as("ss_between_r"),
        round(col("qq").cast("string").cast("double") -
          col("tt").cast("string").cast("double"), 6).as("ss_within_r"))
      .select(col("k_groups"), col("n_total"),
        col("ss_between_r"), col("ss_within_r"),
        round((col("ss_between_r") / (col("k_groups").cast("double") - 1)) /
          (col("ss_within_r") /
            (col("n_total").cast("double") - col("k_groups").cast("double"))),
          6).as("f_stat_r"))
  }
  private val a61AnovaOnewaySql =
    """WITH g AS (SELECT c_mktsegment, COUNT(*) AS n,
      |    SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
      |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4))
      |      * CAST(c_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS q
      |  FROM customer GROUP BY 1),
      |g2 AS (SELECT n, s, q,
      |    CAST(round((CAST(CAST(s AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(s AS VARCHAR) AS DOUBLE))
      |      / CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS term
      |  FROM g),
      |tot AS (SELECT COUNT(*) AS k, SUM(n) AS nt, SUM(s) AS ss,
      |    SUM(q) AS qq, SUM(term) AS tt FROM g2),
      |f1 AS (SELECT CAST(k AS BIGINT) AS k_groups,
      |    CAST(nt AS BIGINT) AS n_total,
      |    round(CAST(CAST(tt AS VARCHAR) AS DOUBLE)
      |      - (CAST(CAST(ss AS VARCHAR) AS DOUBLE)
      |         * CAST(CAST(ss AS VARCHAR) AS DOUBLE))
      |        / CAST(nt AS DOUBLE), 6) AS ss_between_r,
      |    round(CAST(CAST(qq AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(tt AS VARCHAR) AS DOUBLE), 6) AS ss_within_r
      |  FROM tot)
      |SELECT k_groups, n_total, ss_between_r, ss_within_r,
      |  round((ss_between_r / (CAST(k_groups AS DOUBLE) - 1))
      |    / (ss_within_r
      |       / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE))),
      |    6) AS f_stat_r
      |FROM f1""".stripMargin

  // ------------------------------------------------------------------
  // a62_effect_size — Cohen's d and Hedges' g between the AUTOMOBILE
  // and BUILDING segments on account balance: both groups' (n, Σx,
  // Σx²) from ONE conditional-aggregation pass, then every reported
  // double is a single expression over those exact decimals (means,
  // pooled variance, the small-sample J correction 1 − 3/(4N−9)).
  // The effect-size readout that belongs next to every t-test:
  // a62 says HOW BIG, a25 (Welch) says how sure.
  // ------------------------------------------------------------------
  private val a62EffectSize: QFn = (s, dir) => {
    val xdec = col("c_acctbal").cast(DecimalType(18, 4))
    val isA = col("c_mktsegment") === "AUTOMOBILE"
    val isB = col("c_mktsegment") === "BUILDING"
    val agg = t(s, dir, "customer")
      .filter(isA || isB)
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("n1"),
        sum(when(isA, xdec)).as("s1"),
        sum(when(isA, (xdec * xdec).cast(DecimalType(38, 8)))).as("q1"),
        sum(when(isB, 1L).otherwise(0L)).as("n2"),
        sum(when(isB, xdec)).as("s2"),
        sum(when(isB, (xdec * xdec).cast(DecimalType(38, 8)))).as("q2"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    def vd(c: String) = col(c).cast("string").cast("double")
    val m1 = vd("s1") / n1d
    val m2 = vd("s2") / n2d
    val v1 = (vd("q1") - vd("s1") * vd("s1") / n1d) / (n1d - 1)
    val v2 = (vd("q2") - vd("s2") * vd("s2") / n2d) / (n2d - 1)
    val sp = sqrt(((n1d - 1) * v1 + (n2d - 1) * v2) / (n1d + n2d - 2))
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * (n1d + n2d) - 9.0)
    agg.select(col("n1").cast("long").as("n_1"),
      col("n2").cast("long").as("n_2"),
      round(m1 - m2, 6).as("mean_diff_r"),
      round((m1 - m2) / sp, 6).as("cohens_d_r"),
      round(j * ((m1 - m2) / sp), 6).as("hedges_g_r"))
  }
  private val a62EffectSizeSql =
    """WITH agg AS (SELECT
      |    SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
      |      THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS s1,
      |    SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
      |      THEN CAST(CAST(c_acctbal AS DECIMAL(18,4))
      |        * CAST(c_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,8)) END) AS q1,
      |    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN c_mktsegment = 'BUILDING'
      |      THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS s2,
      |    SUM(CASE WHEN c_mktsegment = 'BUILDING'
      |      THEN CAST(CAST(c_acctbal AS DECIMAL(18,4))
      |        * CAST(c_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,8)) END) AS q2
      |  FROM customer
      |  WHERE c_mktsegment = 'AUTOMOBILE' OR c_mktsegment = 'BUILDING')
      |SELECT CAST(n1 AS BIGINT) AS n_1, CAST(n2 AS BIGINT) AS n_2,
      |  round(CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
      |    - CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
      |    AS mean_diff_r,
      |  round((CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
      |    - CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE))
      |   / sqrt(((CAST(n1 AS DOUBLE) - 1)
      |       * ((CAST(CAST(q1 AS VARCHAR) AS DOUBLE)
      |           - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |             * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |             / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
      |     + (CAST(n2 AS DOUBLE) - 1)
      |       * ((CAST(CAST(q2 AS VARCHAR) AS DOUBLE)
      |           - CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |             * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |             / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1)))
      |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2)), 6)
      |    AS cohens_d_r,
      |  round((1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
      |      - 9.0))
      |    * ((CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n2 AS DOUBLE))
      |   / sqrt(((CAST(n1 AS DOUBLE) - 1)
      |       * ((CAST(CAST(q1 AS VARCHAR) AS DOUBLE)
      |           - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |             * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
      |             / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
      |     + (CAST(n2 AS DOUBLE) - 1)
      |       * ((CAST(CAST(q2 AS VARCHAR) AS DOUBLE)
      |           - CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |             * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |             / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1)))
      |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2))), 6)
      |    AS hedges_g_r
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // w42_holt_linear — Holt's linear-trend (double exponential)
  // smoothing over monthly revenue, α = β = 0.5: the distributed part
  // is the exact-decimal monthly aggregate; the recursion runs over
  // the COLLECTED month series — bounded by the CALENDAR (≤ ~84 rows
  // at any data scale, the same bounded-driver-state class as the
  // watermark scalar), never by data volume. Level/trend recursion in
  // raw IEEE doubles with a pinned operation order; the oracle's
  // recursive CTE performs the bit-identical sequence, so level,
  // trend, and the one-step-ahead forecast hash-match without any
  // mid-recursion rounding. Init: l₁ = x₁, b₁ = 0.
  // ------------------------------------------------------------------
  private val w42HoltLinear: QFn = (s, dir) => {
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("month"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
      .orderBy("month")
    // calendar-bounded collect (≤ ~84 months at any SF)
    val series = monthly.collect().map { r =>
      (r.getDate(0), r.getDecimal(1).doubleValue())
    }
    var l = series.head._2
    var b = 0.0
    val out = scala.collection.mutable.ArrayBuffer(
      (series.head._1, series.head._2, l, b, l + b))
    series.drop(1).foreach { case (m, x) =>
      val lNew = 0.5 * x + 0.5 * (l + b)
      val bNew = 0.5 * (lNew - l) + 0.5 * b
      l = lNew; b = bNew
      out += ((m, x, l, b, l + b))
    }
    s.createDataFrame(out.toSeq)
      .toDF("month", "x", "l", "b", "f")
      .select(col("month"), round(col("x"), 4).as("revenue_r"),
        round(col("l"), 6).as("level_r"), round(col("b"), 6).as("trend_r"),
        round(col("f"), 6).as("forecast_next_r"))
      .orderBy("month")
  }
  private val w42HoltLinearSql =
    """WITH RECURSIVE m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY 1),
      |i AS (SELECT month, CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS x,
      |    row_number() OVER (ORDER BY month) AS t
      |  FROM m),
      |hw(t, x, l, b) AS (
      |  SELECT t, x, x, CAST(0.0 AS DOUBLE) FROM i WHERE t = 1
      |  UNION ALL
      |  SELECT i.t, i.x,
      |    0.5 * i.x + 0.5 * (hw.l + hw.b),
      |    0.5 * ((0.5 * i.x + 0.5 * (hw.l + hw.b)) - hw.l) + 0.5 * hw.b
      |  FROM hw JOIN i ON i.t = hw.t + 1)
      |SELECT i.month, round(hw.x, 4) AS revenue_r,
      |  round(hw.l, 6) AS level_r, round(hw.b, 6) AS trend_r,
      |  round(hw.l + hw.b, 6) AS forecast_next_r
      |FROM hw JOIN i ON i.t = hw.t
      |ORDER BY i.month""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a61_anova_oneway" -> a61AnovaOneway,
    "a62_effect_size" -> a62EffectSize,
    "w42_holt_linear" -> w42HoltLinear)

  val oracleSql: Map[String, String] = Map(
    "a61_anova_oneway" -> a61AnovaOnewaySql,
    "a62_effect_size" -> a62EffectSizeSql,
    "w42_holt_linear" -> w42HoltLinearSql)
}

/** Round-7 widening, second pack: Katz centrality (exact integer walk
  * counts — the damping-free counterpart of PageRank that needs no
  * per-round normalization), label-propagation communities (the
  * modularity-free community detector: 3 semi-synchronous rounds of
  * most-frequent-neighbor-label, min-label tie-break), and the exact
  * precision-recall AUC / average precision (the ranking metric that,
  * unlike ROC-AUC, stays honest under heavy class imbalance).
  */
object Frontier42Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Symmetrized co-purchase edges (same construction as g_pagerank /
    * g_two_hop_recs: parts sharing ≥2 orders), checkpointed once —
    * the unrolled rounds below re-read it 3×. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    e0.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint(true)
  }

  private val edgeSql =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |       FROM op a JOIN op b USING (l_orderkey)
      |       WHERE a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa AS src, pb AS dst FROM e0
      |      UNION ALL SELECT pb, pa FROM e0)""".stripMargin

  // ------------------------------------------------------------------
  // g_katz — Katz centrality, truncated at path length 3 with
  // attenuation α = 0.2: c(v) = Σₖ αᵏ · (# walks of length k ending
  // at v). Walk counts are EXACT INTEGERS (w₁ = degree, wₖ = Σ over
  // neighbors of wₖ₋₁), built from k unrolled node-keyed join+agg
  // rounds — hash-partitioned on the node key, no iteration-to-
  // convergence, no per-round normalization (the property that makes
  // Katz cheaper than PageRank at 100 TB). The final score is one
  // exact integer combination (200w₁+40w₂+8w₃)/1000 rounded once.
  // ------------------------------------------------------------------
  private val gKatz: QFn = (s, dir) => {
    val e = coEdges(s, dir)
    val w1 = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("w1"))
    val w2 = e.join(w1.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("w1")).as("w2"))
    val w3 = e.join(w2.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("w2")).as("w3"))
    w1.join(w2, "node").join(w3, "node")
      .select(col("node"), col("w1").cast("long").as("w1"),
        col("w2").cast("long").as("w2"), col("w3").cast("long").as("w3"))
      .withColumn("katz_r",
        round((col("w1") * 200 + col("w2") * 40 + col("w3") * 8)
          .cast("double") / 1000.0, 6))
      .orderBy("node")
  }
  private val gKatzSql =
    s"""WITH $edgeSql,
       |w1 AS (SELECT dst AS node, COUNT(*) AS w1 FROM e GROUP BY 1),
       |w2 AS (SELECT e.dst AS node, SUM(w1.w1) AS w2
       |       FROM e JOIN w1 ON w1.node = e.src GROUP BY 1),
       |w3 AS (SELECT e.dst AS node, SUM(w2.w2) AS w3
       |       FROM e JOIN w2 ON w2.node = e.src GROUP BY 1)
       |SELECT w1.node, CAST(w1.w1 AS BIGINT) AS w1,
       |  CAST(w2.w2 AS BIGINT) AS w2, CAST(w3.w3 AS BIGINT) AS w3,
       |  round(CAST(w1.w1 * 200 + w2.w2 * 40 + w3.w3 * 8 AS DOUBLE)
       |    / 1000.0, 6) AS katz_r
       |FROM w1 JOIN w2 ON w2.node = w1.node JOIN w3 ON w3.node = w1.node
       |ORDER BY w1.node""".stripMargin

  // ------------------------------------------------------------------
  // g_label_prop — label-propagation communities, 3 semi-synchronous
  // rounds: every node starts as its own label; each round it adopts
  // its neighbors' most frequent label, ties broken by the SMALLEST
  // label (the deterministic variant — vanilla LPA's random tie-break
  // would never hash-match). One groupBy(node,label) count plus one
  // per-node argmax per round — both keyed on the node, no global
  // state; rounds are unrolled, so the plan depth is fixed at any
  // graph size. Output: community → member count.
  // ------------------------------------------------------------------
  private val gLabelProp: QFn = (s, dir) => {
    val e = coEdges(s, dir)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    (1 to 3).foreach { _ =>
      val msgs = e.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
      val counts = msgs.groupBy("node", "lbl")
        .agg(count(lit(1)).as("c"))
      labels = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("community")
  }
  private val gLabelPropSql = {
    def round_(prev: String, cur: String) =
      s"""c_$cur AS (SELECT e.dst AS node, $prev.lbl, COUNT(*) AS c
         |  FROM e JOIN $prev ON $prev.node = e.src GROUP BY 1, 2),
         |$cur AS (SELECT node, lbl FROM c_$cur
         |  QUALIFY row_number() OVER (PARTITION BY node
         |    ORDER BY c DESC, lbl) = 1)""".stripMargin
    s"""WITH $edgeSql,
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |${round_("l0", "l1")},
       |${round_("l1", "l2")},
       |${round_("l2", "l3")}
       |SELECT lbl AS community, COUNT(*) AS n_members
       |FROM l3 GROUP BY 1 ORDER BY community""".stripMargin
  }

  // ------------------------------------------------------------------
  // ml_pr_auc — exact average precision (area under the precision-
  // recall curve) for the same prior-spend-vs-future-buyer ranking
  // problem ml_roc_auc scores: AP = Σ over distinct score thresholds
  // (descending) of (Δrecall · precision) = Σ npₛ/NP · TPₛ/(TPₛ+FPₛ).
  // The cumulative TP and (TP+FP) prefixes come from TWO passes of
  // operators/PrefixSum over the distinct-score axis (range-partition
  // + broadcast offsets — never a single-task global window); each
  // threshold's term is one round-12 double frozen as DECIMAL before
  // the reordering sum. Under class imbalance this is the metric that
  // moves when the minority class is mis-ranked — ROC-AUC barely does.
  // ------------------------------------------------------------------
  private val mlPrAuc: QFn = (s, dir) => {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(when(year(col("o_orderdate")) < 1998,
          col("o_totalprice").cast(DecimalType(18, 4)))).as("score"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("y"))
      .filter(col("score").isNotNull)
    val perScore = cust.groupBy("score")
      .agg(sum(col("y")).cast(DecimalType(38, 0)).as("np"),
        count(lit(1)).cast(DecimalType(38, 0)).as("tot"))
    val withTp = graft.operators.PrefixSum.withRunningSum(
      perScore, Seq(col("score").desc), col("np"), "tp")
    val withCum = graft.operators.PrefixSum.withRunningSum(
      withTp, Seq(col("score").desc), col("tot"), "cum")
    val totals = cust.agg(sum(col("y")).cast("long").as("n_pos"),
      sum(lit(1L) - col("y")).cast("long").as("n_neg"))
    val terms = withCum.crossJoin(broadcast(totals))
      .select(col("n_pos"), col("n_neg"),
        round(col("np").cast("double") * col("tp").cast("double") /
          (col("n_pos").cast("double") * col("cum").cast("double")), 12)
          .cast(DecimalType(38, 12)).as("term"))
    terms.groupBy("n_pos", "n_neg")
      .agg(count(lit(1)).as("n_thresholds"),
        sum(col("term")).as("ap"))
      .select(col("n_pos"), col("n_neg"), col("n_thresholds"),
        round(col("ap").cast("string").cast("double"), 6).as("ap_r"))
  }
  private val mlPrAucSql =
    """WITH cust AS (SELECT o_custkey,
      |    SUM(CASE WHEN year(o_orderdate) < 1998
      |      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS score,
      |    MAX(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END) AS y
      |  FROM orders GROUP BY 1),
      |c2 AS (SELECT * FROM cust WHERE score IS NOT NULL),
      |s AS (SELECT score, SUM(y) AS np, COUNT(*) AS tot
      |  FROM c2 GROUP BY 1),
      |tot AS (SELECT SUM(y) AS n_pos, SUM(1 - y) AS n_neg FROM c2),
      |c AS (SELECT score, np,
      |    SUM(np) OVER (ORDER BY score DESC) AS tp,
      |    SUM(tot) OVER (ORDER BY score DESC) AS cum
      |  FROM s),
      |terms AS (SELECT
      |    CAST(round(CAST(np AS DOUBLE) * CAST(tp AS DOUBLE)
      |      / (CAST((SELECT n_pos FROM tot) AS DOUBLE)
      |         * CAST(cum AS DOUBLE)), 12) AS DECIMAL(38,12)) AS term
      |  FROM c)
      |SELECT CAST((SELECT n_pos FROM tot) AS BIGINT) AS n_pos,
      |  CAST((SELECT n_neg FROM tot) AS BIGINT) AS n_neg,
      |  COUNT(*) AS n_thresholds,
      |  round(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE), 6) AS ap_r
      |FROM terms""".stripMargin

  val queries: Map[String, QFn] = Map(
    "g_katz" -> gKatz,
    "g_label_prop" -> gLabelProp,
    "ml_pr_auc" -> mlPrAuc)

  val oracleSql: Map[String, String] = Map(
    "g_katz" -> gKatzSql,
    "g_label_prop" -> gLabelPropSql,
    "ml_pr_auc" -> mlPrAucSql)
}

/** Round-7 widening, third pack: SQ8 scalar-quantized similarity
  * search (the 4-byte→1-byte compression rung below PQ on the ANN
  * memory ladder), deterministic multi-epoch shuffle sharding (the
  * training-loader guarantee that every epoch re-permutes the corpus
  * without materializing an order), and MERGE with a conditional
  * DELETE arm (the reference's MERGE upsert extended with the
  * matched-and-condition→delete clause real CDC feeds need).
  */
object Frontier43Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ann_sq8_topk — scalar-quantization (SQ8) nearest neighbors: each
  // dimension's corpus [min, max] (one bounded dim-keyed aggregate,
  // 64 rows collected) defines a 256-level uniform grid; every vector
  // compresses 4×  to one uint8 code per dim, and the query (vec 0,
  // encoded on the same grid) ranks the corpus by the EXACT INTEGER
  // symmetric code distance Σ(codeᵥ−code_q)² — per-row higher-order
  // functions over plan-time grid literals, NO shuffle and no join at
  // probe time, then a distributed TakeOrdered for the top 10. The
  // 100-TB point: after encoding, the fat float column never needs to
  // be read again — scans touch 1/4 the bytes.
  // ------------------------------------------------------------------
  private val annSq8: QFn = (s, dir) => {
    val all = t(s, dir, "embeddings")
    val corpus = all.filter(col("vec_id") =!= 0)
    val (mn, mx) = graft.textops.Similarity.sq8Train(corpus, "embedding")
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    graft.textops.Similarity.sq8TopK(corpus, "vec_id", "embedding",
      q, k = 10, mn, mx)
  }
  private val annSq8Sql =
    """WITH ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    unnest(embedding) AS x
      |  FROM embeddings WHERE vec_id <> 0),
      |dims AS (SELECT i, CAST(MIN(x) AS DOUBLE) AS mn,
      |    CAST(MAX(x) AS DOUBLE) AS mx
      |  FROM ex GROUP BY 1),
      |qx AS (SELECT generate_subscripts(embedding, 1) AS i,
      |    unnest(embedding) AS x
      |  FROM embeddings WHERE vec_id = 0),
      |qc AS (SELECT q.i,
      |    CASE WHEN d.mx = d.mn THEN 0
      |      ELSE CAST(LEAST(255, GREATEST(0,
      |        floor(((CAST(q.x AS DOUBLE) - d.mn) * 255.0)
      |          / (d.mx - d.mn)))) AS INT) END AS qcode
      |  FROM qx q JOIN dims d USING (i)),
      |cc AS (SELECT e.vec_id, e.i,
      |    CASE WHEN d.mx = d.mn THEN 0
      |      ELSE CAST(LEAST(255, GREATEST(0,
      |        floor(((CAST(e.x AS DOUBLE) - d.mn) * 255.0)
      |          / (d.mx - d.mn)))) AS INT) END AS code
      |  FROM ex e JOIN dims d USING (i))
      |SELECT cc.vec_id,
      |  CAST(SUM(CAST((cc.code - qc.qcode) * (cc.code - qc.qcode)
      |    AS BIGINT)) AS BIGINT) AS sdc2
      |FROM cc JOIN qc USING (i)
      |GROUP BY 1
      |ORDER BY sdc2, vec_id
      |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------
  // p_epoch_shuffle — deterministic per-epoch shuffle sharding: epoch
  // e assigns every document to shard md5("ep<e>:<doc_id>") % 8, so
  // each training epoch sees a genuinely re-permuted corpus WITHOUT
  // ever materializing a global order (the hash IS the permutation —
  // resumable at any offset, reproducible on any cluster layout).
  // Per (epoch, shard): doc count, id checksum, and how many docs
  // stayed in the same shard as the previous epoch ("sticky" — E[1/8]
  // of them, which the output makes visible). The epoch axis is an
  // in-row explode (3 literals), the cross-epoch comparison a
  // doc_id-keyed self-join — everything partitions on doc_id.
  // ------------------------------------------------------------------
  private val pEpochShuffle: QFn = (s, dir) => {
    val assigned = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(array(lit(0), lit(1), lit(2))).as("epoch"))
      .withColumn("shard",
        pmod(conv(substring(md5(concat(lit("ep"),
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
          lit(8L)))
    val prev = assigned.select(col("doc_id"),
      (col("epoch") + 1).as("epoch"), col("shard").as("prev_shard"))
    assigned.join(prev, Seq("doc_id", "epoch"), "left")
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(when(col("prev_shard") === col("shard"), 1L).otherwise(0L))
          .as("n_sticky"))
      .orderBy("epoch", "shard")
  }
  private val pEpochShuffleSql =
    """WITH ep AS (SELECT 0 AS epoch UNION ALL SELECT 1 UNION ALL SELECT 2),
      |a AS (SELECT d.doc_id, ep.epoch,
      |    CAST(('0x' || substring(md5('ep' || CAST(ep.epoch AS VARCHAR)
      |      || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
      |      AS shard
      |  FROM documents d CROSS JOIN ep)
      |SELECT a.epoch, a.shard, COUNT(*) AS n_docs,
      |  CAST(SUM(a.doc_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(CASE WHEN p.prev_shard = a.shard THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_sticky
      |FROM a LEFT JOIN (SELECT doc_id, epoch + 1 AS epoch,
      |    shard AS prev_shard FROM a) p
      |  ON p.doc_id = a.doc_id AND p.epoch = a.epoch
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // i26_merge_delete — MERGE with a conditional DELETE arm, the CDC
  // shape the reference's SCD1 MERGE (proc_load_silver) lacks:
  //   WHEN MATCHED AND src.status = 'F'  THEN DELETE
  //   WHEN MATCHED                       THEN UPDATE (take src price)
  //   WHEN NOT MATCHED                   THEN INSERT
  // Base = even order keys, source batch = every third key with a
  // +50.00 price adjustment. The functional rebuild composes the
  // three arms as key-partitioned anti/semi joins + one union — the
  // same plan a Delta MERGE compiles to, minus the transaction log
  // (no ACID format ships in this environment). Output: final-state
  // row counts and exact price totals per order status.
  // ------------------------------------------------------------------
  private val i26MergeDelete: QFn = (s, dir) => {
    val orders = t(s, dir, "orders")
    val base = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("p"))
    val src = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast(DecimalType(18, 4)) +
          lit(BigDecimal("50.00")).cast(DecimalType(18, 4))).as("p"))
    val srcKeys = src.select("o_orderkey")
    val kept = base.join(srcKeys, Seq("o_orderkey"), "left_anti")
    val updated = src.join(base.select("o_orderkey"),
        Seq("o_orderkey"), "left_semi")
      .filter(col("o_orderstatus") =!= "F")
    val inserted = src.join(base.select("o_orderkey"),
      Seq("o_orderkey"), "left_anti")
    kept.unionByName(updated).unionByName(inserted)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("p")).cast("double").as("price_sum"))
      .orderBy("o_orderstatus")
  }
  private val i26MergeDeleteSql =
    """WITH base AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS p
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |src AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,4)) + CAST(50.00 AS DECIMAL(18,4))
      |      AS p
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |kept AS (SELECT o_orderstatus, p FROM base
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)),
      |upd AS (SELECT s.o_orderstatus, s.p FROM src s
      |  WHERE s.o_orderkey IN (SELECT o_orderkey FROM base)
      |    AND s.o_orderstatus <> 'F'),
      |ins AS (SELECT o_orderstatus, p FROM src
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM base)),
      |fin AS (SELECT * FROM kept UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins)
      |SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(p) AS DOUBLE) AS price_sum
      |FROM fin GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ann_sq8_topk" -> annSq8,
    "p_epoch_shuffle" -> pEpochShuffle,
    "i26_merge_delete" -> i26MergeDelete)

  val oracleSql: Map[String, String] = Map(
    "ann_sq8_topk" -> annSq8Sql,
    "p_epoch_shuffle" -> pEpochShuffleSql,
    "i26_merge_delete" -> i26MergeDeleteSql)
}

/** Round-7 widening, fourth pack: Levene's test (the variance-equality
  * gate the pooled-variance tests silently assume), McNemar's paired
  * test (the before/after binary-outcome test that survey/retention
  * readouts need — a62/a25 compare GROUPS, this compares the SAME
  * subjects twice), and per-user inter-arrival burstiness (the
  * (σ−μ)/(σ+μ) coefficient separating bot-like regularity from bursty
  * human sessions).
  */
object Frontier44Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a63_levene — Levene's test for homogeneity of variance across
  // market segments: each observation maps to its absolute deviation
  // z = |x − mean(group)| (group means frozen as round-6 DECIMALs, so
  // z is exact decimal arithmetic), then the one-way ANOVA F machinery
  // runs over z. Two keyed aggregation passes + one broadcast join of
  // the 5-row means table; W > F-critical says "unequal spreads — use
  // Welch, not the pooled test". The honest pre-flight for a25/a61.
  // ------------------------------------------------------------------
  private val a63Levene: QFn = (s, dir) => {
    val xdec = col("c_acctbal").cast(DecimalType(18, 4))
    val cust = t(s, dir, "customer")
    val means = cust.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(xdec).as("sx"))
      .select(col("c_mktsegment"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("m"))
    // z fits (16,6) comfortably (|deviation| < 1e5); the narrow factor
    // keeps the product at (33,12) — EXACT in both engines (a (20,6)²
    // product exceeds precision 38 and silently loses scale in Spark)
    val z = cust.join(broadcast(means), "c_mktsegment")
      .select(col("c_mktsegment"),
        abs(xdec - col("m")).cast(DecimalType(16, 6)).as("z"))
    val g = z.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
        sum((col("z") * col("z")).cast(DecimalType(38, 12))).as("qz"))
      .withColumn("term",
        round((col("sz").cast("string").cast("double") *
          col("sz").cast("string").cast("double")) /
          col("n").cast("double"), 6).cast(DecimalType(38, 6)))
    g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("sz")).as("ssz"), sum(col("qz")).as("qqz"),
        sum(col("term")).as("tt"))
      .select(col("k").cast("long").as("k_groups"),
        col("nt").cast("long").as("n_total"),
        round(col("tt").cast("string").cast("double") -
          (col("ssz").cast("string").cast("double") *
            col("ssz").cast("string").cast("double")) /
            col("nt").cast("double"), 6).as("ssb_z_r"),
        round(col("qqz").cast("string").cast("double") -
          col("tt").cast("string").cast("double"), 6).as("ssw_z_r"))
      .select(col("k_groups"), col("n_total"), col("ssb_z_r"),
        col("ssw_z_r"),
        round((col("ssb_z_r") / (col("k_groups").cast("double") - 1)) /
          (col("ssw_z_r") /
            (col("n_total").cast("double") - col("k_groups").cast("double"))),
          6).as("w_stat_r"))
  }
  private val a63LeveneSql =
    """WITH means AS (SELECT c_mktsegment,
      |    CAST(round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS m
      |  FROM customer GROUP BY 1),
      |z AS (SELECT c.c_mktsegment,
      |    CAST(abs(CAST(c_acctbal AS DECIMAL(18,4)) - means.m)
      |      AS DECIMAL(16,6)) AS z
      |  FROM customer c JOIN means USING (c_mktsegment)),
      |g AS (SELECT c_mktsegment, COUNT(*) AS n, SUM(z) AS sz,
      |    SUM(CAST(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS qz
      |  FROM z GROUP BY 1),
      |g2 AS (SELECT n, sz, qz,
      |    CAST(round((CAST(CAST(sz AS VARCHAR) AS DOUBLE)
      |        * CAST(CAST(sz AS VARCHAR) AS DOUBLE))
      |      / CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS term
      |  FROM g),
      |tot AS (SELECT COUNT(*) AS k, SUM(n) AS nt, SUM(sz) AS ssz,
      |    SUM(qz) AS qqz, SUM(term) AS tt FROM g2),
      |f1 AS (SELECT CAST(k AS BIGINT) AS k_groups,
      |    CAST(nt AS BIGINT) AS n_total,
      |    round(CAST(CAST(tt AS VARCHAR) AS DOUBLE)
      |      - (CAST(CAST(ssz AS VARCHAR) AS DOUBLE)
      |         * CAST(CAST(ssz AS VARCHAR) AS DOUBLE))
      |        / CAST(nt AS DOUBLE), 6) AS ssb_z_r,
      |    round(CAST(CAST(qqz AS VARCHAR) AS DOUBLE)
      |      - CAST(CAST(tt AS VARCHAR) AS DOUBLE), 6) AS ssw_z_r
      |  FROM tot)
      |SELECT k_groups, n_total, ssb_z_r, ssw_z_r,
      |  round((ssb_z_r / (CAST(k_groups AS DOUBLE) - 1))
      |    / (ssw_z_r
      |       / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE))),
      |    6) AS w_stat_r
      |FROM f1""".stripMargin

  // ------------------------------------------------------------------
  // a64_mcnemar — McNemar's test on paired binary outcomes: did the
  // SAME customers who ordered in 1997 keep ordering in 1998? Only the
  // discordant cells matter: b = active→churned, c = inactive→joined;
  // χ² = (b−c)²/(b+c), plus the continuity-corrected variant. One
  // grouped pass builds the per-customer (before, after) pair, one
  // ungrouped pass counts cells — exact integers until the two final
  // rounded divisions.
  // ------------------------------------------------------------------
  private val a64Mcnemar: QFn = (s, dir) => {
    val pairs = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(max(when(year(col("o_orderdate")) === 1997, 1L).otherwise(0L))
          .as("x"),
        max(when(year(col("o_orderdate")) === 1998, 1L).otherwise(0L))
          .as("y"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("x") === 1 && col("y") === 0, 1L).otherwise(0L))
          .as("b_count"),
        sum(when(col("x") === 0 && col("y") === 1, 1L).otherwise(0L))
          .as("c_count"))
      .select(col("n_pairs"), col("b_count"), col("c_count"),
        round(((col("b_count") - col("c_count")) *
          (col("b_count") - col("c_count"))).cast("double") /
          (col("b_count") + col("c_count")).cast("double"), 6)
          .as("chi2_r"),
        round(((abs(col("b_count") - col("c_count")) - 1) *
          (abs(col("b_count") - col("c_count")) - 1)).cast("double") /
          (col("b_count") + col("c_count")).cast("double"), 6)
          .as("chi2_cc_r"))
  }
  private val a64McnemarSql =
    """WITH pairs AS (SELECT o_custkey,
      |    MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS x,
      |    MAX(CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END) AS y
      |  FROM orders GROUP BY 1),
      |cells AS (SELECT COUNT(*) AS n_pairs,
      |    SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS b_count,
      |    SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS c_count
      |  FROM pairs)
      |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(b_count AS BIGINT) AS b_count,
      |  CAST(c_count AS BIGINT) AS c_count,
      |  round(CAST((b_count - c_count) * (b_count - c_count) AS DOUBLE)
      |    / CAST(b_count + c_count AS DOUBLE), 6) AS chi2_r,
      |  round(CAST((abs(b_count - c_count) - 1)
      |      * (abs(b_count - c_count) - 1) AS DOUBLE)
      |    / CAST(b_count + c_count AS DOUBLE), 6) AS chi2_cc_r
      |FROM cells""".stripMargin

  // ------------------------------------------------------------------
  // ev_burstiness — per-user inter-arrival burstiness B = (σ−μ)/(σ+μ)
  // over exact microsecond gaps: B → −1 for metronome-regular (bot)
  // traffic, 0 for Poisson, → +1 for extreme burst-silence cycles.
  // Gaps via a user-keyed LAG window (partitioned on the data-scaled
  // user axis), moments as exact DECIMAL(38,0) integer sums (Σgap² of
  // µs values exceeds 2⁶³ — decimal is mandatory, and the double casts
  // VARCHAR-route for the same reason), one rounded expression per
  // reported statistic. Users with < 5 gaps are too short to score.
  // ------------------------------------------------------------------
  private val evBurstiness: QFn = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val gaps = Tables.loadEvents(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(DecimalType(38, 0))).as("sg"),
        sum((col("gap").cast(DecimalType(19, 0)) *
          col("gap").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
          .as("qg"))
      .filter(col("n_gaps") >= 5)
      .select(col("user_id"), col("n_gaps"),
        round(col("sg").cast("string").cast("double") /
          col("n_gaps").cast("double"), 4).as("mean_gap_us_r"),
        round((sqrt(col("qg").cast("string").cast("double") /
            col("n_gaps").cast("double") -
            (col("sg").cast("string").cast("double") /
              col("n_gaps").cast("double")) *
            (col("sg").cast("string").cast("double") /
              col("n_gaps").cast("double"))) -
          col("sg").cast("string").cast("double") /
            col("n_gaps").cast("double")) /
          (sqrt(col("qg").cast("string").cast("double") /
            col("n_gaps").cast("double") -
            (col("sg").cast("string").cast("double") /
              col("n_gaps").cast("double")) *
            (col("sg").cast("string").cast("double") /
              col("n_gaps").cast("double"))) +
          col("sg").cast("string").cast("double") /
            col("n_gaps").cast("double")), 6).as("burstiness_r"))
      .orderBy("user_id")
  }
  private val evBurstinessSql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |g0 AS (SELECT user_id,
      |    us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS gap
      |  FROM e),
      |g AS (SELECT user_id, gap FROM g0 WHERE gap IS NOT NULL),
      |agg AS (SELECT user_id, COUNT(*) AS n_gaps,
      |    SUM(CAST(gap AS DECIMAL(38,0))) AS sg,
      |    SUM(CAST(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))
      |      AS DECIMAL(38,0))) AS qg
      |  FROM g GROUP BY 1 HAVING COUNT(*) >= 5)
      |SELECT user_id, n_gaps,
      |  round(CAST(CAST(sg AS VARCHAR) AS DOUBLE)
      |    / CAST(n_gaps AS DOUBLE), 4) AS mean_gap_us_r,
      |  round((sqrt(CAST(CAST(qg AS VARCHAR) AS DOUBLE)
      |      / CAST(n_gaps AS DOUBLE)
      |      - (CAST(CAST(sg AS VARCHAR) AS DOUBLE)
      |          / CAST(n_gaps AS DOUBLE))
      |        * (CAST(CAST(sg AS VARCHAR) AS DOUBLE)
      |          / CAST(n_gaps AS DOUBLE)))
      |    - CAST(CAST(sg AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE))
      |  / (sqrt(CAST(CAST(qg AS VARCHAR) AS DOUBLE)
      |      / CAST(n_gaps AS DOUBLE)
      |      - (CAST(CAST(sg AS VARCHAR) AS DOUBLE)
      |          / CAST(n_gaps AS DOUBLE))
      |        * (CAST(CAST(sg AS VARCHAR) AS DOUBLE)
      |          / CAST(n_gaps AS DOUBLE)))
      |    + CAST(CAST(sg AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
      |  6) AS burstiness_r
      |FROM agg ORDER BY user_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a63_levene" -> a63Levene,
    "a64_mcnemar" -> a64Mcnemar,
    "ev_burstiness" -> evBurstiness)

  val oracleSql: Map[String, String] = Map(
    "a63_levene" -> a63LeveneSql,
    "a64_mcnemar" -> a64McnemarSql,
    "ev_burstiness" -> evBurstinessSql)
}

/** Round-7 widening, fifth pack: b-bit MinHash (the 1-bit-per-hash
  * compression of the MinHash sketch — 64× smaller signatures at a
  * quantified accuracy cost, measured here against the exact Jaccard
  * on every verified near-dup pair), PCM audio interpretation over
  * binary media blobs (RMS energy + zero-crossing rate — the audio
  * twins of the image-decode features, bytes-in integers-out), and
  * the IR ranking-metrics scorecard (P@10 / MRR@10 / NDCG@10 over
  * label-relevance retrieval — BM25 and cosine entries retrieve,
  * this entry GRADES retrieval).
  */
object Frontier45Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // d_bbit_minhash — 1-bit MinHash accuracy audit: 16 portable
  // (md5-derived, DuckDB-replayable) minhash values per document keep
  // only their LOWEST BIT — a 16-bit signature. For two docs the
  // expected bit-agreement is (1+J)/2, so Ĵ = 2·(agree/16) − 1. The
  // entry scores the estimator against the EXACT Jaccard on every
  // verified near-dup pair (the d_minhash_lsh output set): bits are
  // exact integers (bit_count over XOR), the estimate one rounded
  // expression. The sketch a 100-TB dedup keeps in RAM when even
  // 32×8-byte signatures are too fat — with its error now measured,
  // not assumed.
  // ------------------------------------------------------------------
  private val dBbitMinhash: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
    val words = split(graft.textops.TextFunctions.normText(col("text")), " ")
    val sh = docs.select(col("doc_id"), words.as("__w"))
      .select(col("doc_id"), col("__w"),
        posexplode(col("__w")).as(Seq("__p", "__x")))
      .filter(col("__p") <= size(col("__w")) - 3)
      .select(col("doc_id"), concat_ws(" ", col("__x"),
        element_at(col("__w"), col("__p") + 2),
        element_at(col("__w"), col("__p") + 3)).as("shingle"))
      .distinct()
    def h(j: Int): Column =
      conv(substring(md5(concat(lit(s"$j:"), col("shingle"))), 1, 8),
        16, 10).cast("long")
    val mins = sh.groupBy("doc_id")
      .agg(min(h(0)).as("m0"),
        (1 until 16).map(j => min(h(j)).as(s"m$j")): _*)
    val bits = mins.select(col("doc_id"),
      (0 until 16).map(j => (col(s"m$j") % 2) * lit(1L << j))
        .reduce(_ + _).cast("long").as("bits"))
    val pairs = graft.textops.Dedup.minhashLshVerified(docs,
      "doc_id", "text", shingleK = 3, numHashes = 32, bands = 8,
      threshold = 0.5)
    val agree = (lit(16) -
      bit_count(col("bits_a").bitwiseXOR(col("bits_b")))).cast("int")
    pairs
      .join(bits.select(col("doc_id").as("id_a"), col("bits").as("bits_a")),
        "id_a")
      .join(bits.select(col("doc_id").as("id_b"), col("bits").as("bits_b")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        agree.as("n_agree"),
        round(lit(2.0) * agree / 16.0 - 1.0, 6).as("est_r"),
        round((lit(2.0) * agree / 16.0 - 1.0) - col("jaccard"), 6)
          .as("err_r"))
      .orderBy("id_a", "id_b")
  }
  private val dBbitMinhashSql = {
    val norm = graft.textops.TextFunctions.normTextSql("text")
    val minCols = (0 until 16).map(j =>
      s"MIN(CAST(('0x' || substring(md5('$j:' || shingle), 1, 8)) AS BIGINT)) AS m$j")
      .mkString(",\n|    ")
    val bitsExpr = (0 until 16).map(j => s"(m$j % 2) * ${1L << j}")
      .mkString(" + ")
    s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws
       |  FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
       |    i -> array_to_string(ws[i:i+2], ' '))) AS shingle
       |  FROM w),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY 1),
       |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
       |          FROM sh0 x JOIN sh0 y USING (shingle)
       |          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b,
       |    CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
       |  FROM inter JOIN sizes sa ON sa.doc_id = id_a
       |             JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
       |mh AS (SELECT doc_id,
       |    $minCols
       |  FROM sh0 GROUP BY doc_id),
       |bits AS (SELECT doc_id, CAST($bitsExpr AS BIGINT) AS bits FROM mh)
       |SELECT p.id_a, p.id_b, p.jaccard,
       |  CAST(16 - bit_count(xor(ba.bits, bb.bits)) AS INT) AS n_agree,
       |  round(2.0 * (16 - bit_count(xor(ba.bits, bb.bits))) / 16.0 - 1.0,
       |    6) AS est_r,
       |  round((2.0 * (16 - bit_count(xor(ba.bits, bb.bits))) / 16.0 - 1.0)
       |    - p.jaccard, 6) AS err_r
       |FROM pairs p JOIN bits ba ON ba.doc_id = p.id_a
       |             JOIN bits bb ON bb.doc_id = p.id_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------------------------------------
  // mm_audio_pcm — PCM audio interpretation of binary media blobs:
  // each blob's bytes parse as 16-bit little-endian signed samples
  // (the WAV data-chunk layout), and the entry reports the three
  // signals an audio-quality filter gates on — RMS energy, mean
  // amplitude (DC offset), zero-crossing count (spectral proxy). The
  // whole decode is higher-order functions over one hex projection —
  // integers end to end, no explode, no shuffle beyond the scan; the
  // oracle re-parses the same bytes positionally in SQL. Companion to
  // mm_decode_features (images): bytes-in, measured-features-out.
  // ------------------------------------------------------------------
  private val mmAudioPcm: QFn = (s, dir) => {
    val m = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("blob"))
      .select(col("media_id"), hex(col("blob")).as("hx"),
        floor(length(col("blob")) / 2).cast("long").as("n"))
      .filter(col("n") >= 2)
    val samples = transform(sequence(lit(0L), col("n") - 1), i => {
      val u = conv(concat(
        col("hx").substr((i * 4 + 3).cast("int"), lit(2)),
        col("hx").substr((i * 4 + 1).cast("int"), lit(2))), 16, 10)
        .cast("int")
      when(u >= 32768, u - 65536).otherwise(u)
    })
    m.select(col("media_id"), col("n").as("n_samples"),
        samples.as("__s"))
      .select(col("media_id"), col("n_samples"),
        aggregate(col("__s"), lit(0L), (a, x) => a + x).as("__sum"),
        aggregate(col("__s"), lit(0L),
          (a, x) => a + x.cast("long") * x.cast("long")).as("__sumsq"),
        aggregate(zip_with(
            slice(col("__s"), lit(1), (col("n_samples") - 1).cast("int")),
            slice(col("__s"), lit(2), (col("n_samples") - 1).cast("int")),
            (x, y) => when((x < 0) =!= (y < 0), 1L).otherwise(0L)),
          lit(0L), (a, x) => a + x).as("n_zero_cross"))
      .select(col("media_id"), col("n_samples"),
        round(col("__sum").cast("double") /
          col("n_samples").cast("double"), 6).as("mean_amp_r"),
        round(sqrt(col("__sumsq").cast("double") /
          col("n_samples").cast("double")), 6).as("rms_r"),
        col("n_zero_cross"))
      .orderBy("media_id")
  }
  private val mmAudioPcmSql =
    """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) // 2 AS BIGINT) AS n
      |  FROM documents),
      |m2 AS (SELECT * FROM m WHERE n >= 2),
      |s0 AS (SELECT media_id, n, hx,
      |    unnest(range(0, n)) AS i
      |  FROM m2),
      |s1 AS (SELECT media_id, n, i,
      |    CAST(('0x' || substring(hx, CAST(4*i+3 AS INT), 2)
      |      || substring(hx, CAST(4*i+1 AS INT), 2)) AS INT) AS u
      |  FROM s0),
      |s AS (SELECT media_id, n, i,
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
      |  FROM s1),
      |z AS (SELECT media_id, n, v,
      |    LAG(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
      |  FROM s),
      |agg AS (SELECT media_id, MAX(n) AS n_samples,
      |    SUM(CAST(v AS BIGINT)) AS sum_v,
      |    SUM(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS sumsq_v,
      |    SUM(CASE WHEN pv IS NOT NULL
      |      AND ((v < 0) <> (pv < 0)) THEN 1 ELSE 0 END) AS n_zero_cross
      |  FROM z GROUP BY 1)
      |SELECT media_id, n_samples,
      |  round(CAST(sum_v AS DOUBLE) / CAST(n_samples AS DOUBLE), 6)
      |    AS mean_amp_r,
      |  round(sqrt(CAST(sumsq_v AS DOUBLE) / CAST(n_samples AS DOUBLE)),
      |    6) AS rms_r,
      |  CAST(n_zero_cross AS BIGINT) AS n_zero_cross
      |FROM agg ORDER BY media_id""".stripMargin

  // ------------------------------------------------------------------
  // ml_ranking_metrics — the retrieval scorecard: probes = vectors
  // 1–5, corpus = the rest, relevance = label match. Exact cosine
  // scores every (probe, corpus) pair (one corpus scan; the probe
  // axis is an in-row literal explode), the NATIVE TopKPerGroup
  // operator cuts the top 10 per probe (bounded-heap partial/final —
  // the shuffle carries ≤ k·partitions rows, never the corpus), and
  // P@10 / MRR@10 / NDCG@10 reduce over those 50 rows. DCG weights
  // are integer micro-units (⌊10⁶/log₂(r+1)⌉ literals baked into both
  // engines) so the metric is exact integer arithmetic until one
  // final rounded division — no cross-engine libm log in sight.
  // ------------------------------------------------------------------
  private val wMic: IndexedSeq[Long] = (1 to 10).map(r =>
    math.round(1e6 / (math.log(r + 1) / math.log(2))))
  private val wCum: IndexedSeq[Long] = wMic.scanLeft(0L)(_ + _).tail

  private val mlRankingMetrics: QFn = (s, dir) => {
    val all = t(s, dir, "embeddings")
    val probes = all.filter(col("vec_id").between(1, 5))
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray)).sortBy(_._1)
    val qarr = array(probes.map { case (qid, qlabel, vec) =>
      struct(lit(qid).as("qid"), lit(qlabel).as("qlabel"),
        array(vec.map(x => lit(x)): _*).as("qv"))
    }: _*)
    val scored = all.filter(col("vec_id") > 5)
      .select(col("vec_id"), col("label"), col("embedding"),
        explode(qarr).as("q"))
      .select(col("q.qid").as("qid"), col("q.qlabel").as("qlabel"),
        col("vec_id"), col("label"),
        round(graft.textops.Similarity.cosineNative(
          col("embedding"), col("q.qv")), 6).as("score_r"))
      .localCheckpoint(true)
    val nrel = scored.groupBy("qid")
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L))
        .as("n_rel"))
    val top = graft.plans.TopKPerGroup.topK(scored, Seq("qid"),
      Seq(("score_r", true), ("vec_id", false)), 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid")
      .orderBy(col("score_r").desc, col("vec_id").asc)
    val ranked = top.withColumn("r", row_number().over(w))
      .withColumn("rel",
        when(col("label") === col("qlabel"), 1L).otherwise(0L))
    val wMicExpr = (1 to 10).map(r =>
      when(col("r") === r, lit(wMic(r - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    val perQ = ranked.groupBy("qid")
      .agg(sum(col("rel")).as("rel10"),
        sum(col("rel") * wMicExpr).as("dcg_mic"),
        min(when(col("rel") === 1, col("r"))).as("first_rel"))
    val idcgExpr = {
      val capped = least(col("n_rel"), lit(10L)).cast("int")
      (1 to 10).map(k =>
        when(capped === k, lit(wCum(k - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
    }
    perQ.join(nrel, "qid")
      .select(col("qid"), col("n_rel"),
        round(col("rel10").cast("double") / 10.0, 6).as("p_at_10_r"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"),
          lit(0.0)), 6).as("mrr_at_10_r"),
        round(when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("dcg_mic").cast("double") /
            idcgExpr.cast("double")), 6).as("ndcg_at_10_r"))
      .orderBy("qid")
  }
  private val mlRankingMetricsSql = {
    val wCase = (1 to 10).map(r =>
      s"WHEN r = $r THEN ${wMic(r - 1)}").mkString(" ")
    val idcgCase = (1 to 10).map(k =>
      s"WHEN LEAST(n_rel, 10) = $k THEN ${wCum(k - 1)}").mkString(" ")
    s"""WITH q AS (SELECT vec_id AS qid, label AS qlabel,
       |    unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings WHERE vec_id BETWEEN 1 AND 5),
       |v AS (SELECT vec_id, label, unnest(embedding) AS xv,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings WHERE vec_id > 5),
       |sc AS (SELECT q.qid, q.qlabel, v.vec_id, v.label,
       |    round(SUM(CAST(xv AS DOUBLE) * CAST(qv AS DOUBLE))
       |      / NULLIF(sqrt(SUM(CAST(xv AS DOUBLE) * CAST(xv AS DOUBLE)))
       |        * sqrt(SUM(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE))), 0.0),
       |      6) AS score_r
       |  FROM v JOIN q USING (i) GROUP BY 1, 2, 3, 4),
       |nrel AS (SELECT qid,
       |    SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS n_rel
       |  FROM sc GROUP BY 1),
       |rk AS (SELECT qid, qlabel, vec_id, label,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY score_r DESC, vec_id) AS r
       |  FROM sc),
       |top AS (SELECT *, CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
       |  FROM rk WHERE r <= 10),
       |perq AS (SELECT qid, SUM(rel) AS rel10,
       |    SUM(rel * (CASE $wCase ELSE 0 END)) AS dcg_mic,
       |    MIN(CASE WHEN rel = 1 THEN r END) AS first_rel
       |  FROM top GROUP BY 1)
       |SELECT p.qid, CAST(n.n_rel AS BIGINT) AS n_rel,
       |  round(CAST(rel10 AS DOUBLE) / 10.0, 6) AS p_at_10_r,
       |  round(COALESCE(1.0 / CAST(first_rel AS DOUBLE), 0.0), 6)
       |    AS mrr_at_10_r,
       |  round(CASE WHEN n.n_rel = 0 THEN 0.0
       |    ELSE CAST(dcg_mic AS DOUBLE)
       |      / CAST((CASE $idcgCase ELSE 0 END) AS DOUBLE) END, 6)
       |    AS ndcg_at_10_r
       |FROM perq p JOIN nrel n ON n.qid = p.qid
       |ORDER BY p.qid""".stripMargin
  }

  // ------------------------------------------------------------------
  // mm_container_meta — container METADATA without codecs: duration,
  // resolution, sample rate, track count parsed from the blob BYTES of
  // well-formed WAV (RIFF chunks) and MP4 (ISO-BMFF boxes) containers.
  // The payload codecs aren't in the JVM — the point is that the
  // metadata never needed them: both layouts are public byte formats,
  // and the parse is pure column expressions (one hex projection +
  // bounded chunk/box walks via `aggregate`) — fully codegen, no UDF,
  // no mapPartitions. Blobs are generated executor-side from id-derived
  // parameters with LAYOUT VARIANCE (LIST chunks in every third WAV,
  // `free` boxes in every second MP4), so a fixed-offset reader would
  // mis-parse: the walks are load-bearing. The oracle is closed-form
  // from the generator parameters (the mm_audio_pcm pattern): duration
  // is one exact integer division rendered at round-6 — no
  // transcendental in sight (SURVEY §11 frozen-transcendental
  // checklist: rule 1, exact route).
  // ------------------------------------------------------------------
  private val mmContainerMeta: QFn = (s, dir) => {
    val ids = t(s, dir, "documents").select(col("doc_id"))
    val media = graft.textops.Multimodal.containerMediaTable(ids, "doc_id")
    graft.textops.Multimodal.containerMeta(media).orderBy("media_id")
  }
  private val mmContainerMetaSql =
    """WITH k AS (SELECT doc_id, doc_id // 2 AS k, doc_id % 2 = 0 AS is_wav
      |  FROM documents),
      |f AS (SELECT doc_id AS media_id, is_wav,
      |    CASE k % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |      WHEN 2 THEN 22050 ELSE 44100 END AS wav_rate,
      |    1 + k % 2 AS wav_ch,
      |    500 + (k % 7) * 137 AS wav_samples,
      |    CASE k % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
      |      ELSE 90000 END AS ts,
      |    1 + k % 3 AS n_traks,
      |    320 + 16 * (k % 8) AS mp4_w,
      |    240 + 16 * (k % 6) AS mp4_h,
      |    k FROM k)
      |SELECT media_id,
      |  CASE WHEN is_wav THEN 'wav' ELSE 'mp4' END AS format,
      |  CAST(CASE WHEN is_wav THEN wav_ch ELSE n_traks END AS BIGINT)
      |    AS n_tracks,
      |  CAST(CASE WHEN is_wav THEN wav_rate ELSE 0 END AS BIGINT)
      |    AS sample_rate,
      |  round(CASE WHEN is_wav
      |      THEN CAST(wav_samples AS DOUBLE) * 1000.0
      |        / CAST(wav_rate AS DOUBLE)
      |      ELSE CAST(ts * (1 + k % 5) + (k % 97) AS DOUBLE) * 1000.0
      |        / CAST(ts AS DOUBLE) END, 6) AS duration_ms_r,
      |  CAST(CASE WHEN is_wav THEN 0 ELSE mp4_w END AS BIGINT) AS width,
      |  CAST(CASE WHEN is_wav THEN 0 ELSE mp4_h END AS BIGINT) AS height
      |FROM f ORDER BY media_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "d_bbit_minhash" -> dBbitMinhash,
    "mm_audio_pcm" -> mmAudioPcm,
    "mm_container_meta" -> mmContainerMeta,
    "ml_ranking_metrics" -> mlRankingMetrics)

  val oracleSql: Map[String, String] = Map(
    "d_bbit_minhash" -> dBbitMinhashSql,
    "mm_audio_pcm" -> mmAudioPcmSql,
    "mm_container_meta" -> mmContainerMetaSql,
    "ml_ranking_metrics" -> mlRankingMetricsSql)
}

/** Round-7 widening, sixth pack: SCD Type 6 (the 1+2+3 hybrid
  * dimension — full history AND an always-current overwrite AND a
  * prev-value column, the shape BI teams actually request), query-side
  * multiprobe LSH (probe the exact bucket plus every 1-bit neighbor —
  * the recall of many hash tables at the memory cost of few), and the
  * corpus-curation attrition funnel (per-filter survivor counts — the
  * first artifact anyone asks of a training-data pipeline: "where did
  * my documents go?").
  */
object Frontier46Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // i27_scd6 — hybrid SCD Type 6 over a simulated segment-change
  // batch: customers whose md5 class is 0 "move" to a rotated market
  // segment. The result carries ALL THREE slowly-changing idioms at
  // once: Type 2 history (one row per version, version/is_current
  // flags), Type 1 overwrite (current_segment repeated on EVERY
  // version row — historical rows still answer "what is it NOW"),
  // and Type 3 prior (prev_segment beside it). Built functionally:
  // one hash classification, one union of version rows, one keyed
  // self-join for the overwrite column — every stage partitioned on
  // the customer key. Output: per (segment-at-version, is_current)
  // row counts + version stats, the shape a dimension audit reads.
  // ------------------------------------------------------------------
  private val i27Scd6: QFn = (s, dir) => {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        (conv(substring(md5(concat(lit("scd6:"),
          col("c_custkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 5).as("h"))
    val changed = cust.filter(col("h") === 0)
      .select(col("c_custkey"),
        concat(lit("NEW_"), col("c_mktsegment")).as("seg2"))
    val v1 = cust.select(col("c_custkey"),
      col("c_mktsegment").as("segment"), lit(1).as("version"))
    val v2 = changed.select(col("c_custkey"), col("seg2").as("segment"),
      lit(2).as("version"))
    val versions = v1.unionByName(v2)
    val current = versions.groupBy("c_custkey")
      .agg(max(col("version")).as("max_v"))
    val rows = versions.join(current, "c_custkey")
      .withColumn("is_current", col("version") === col("max_v"))
    val curSeg = rows.filter(col("is_current"))
      .select(col("c_custkey"), col("segment").as("current_segment"))
    val prevSeg = rows.filter(col("version") === 1 && col("max_v") === 2)
      .select(col("c_custkey"), col("segment").as("prev_segment"))
    rows.join(curSeg, "c_custkey")
      .join(prevSeg, Seq("c_custkey"), "left")
      .groupBy(col("segment"), col("is_current"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("current_segment") =!= col("segment"), 1L)
          .otherwise(0L)).as("n_superseded"),
        sum(when(col("prev_segment").isNotNull, 1L).otherwise(0L))
          .as("n_with_prior"))
      .orderBy("segment", "is_current")
  }
  private val i27Scd6Sql =
    """WITH cust AS (SELECT c_custkey, c_mktsegment,
      |    CAST(('0x' || substring(md5('scd6:' || CAST(c_custkey AS VARCHAR)),
      |      1, 8)) AS BIGINT) % 5 AS h
      |  FROM customer),
      |v1 AS (SELECT c_custkey, c_mktsegment AS segment, 1 AS version
      |  FROM cust),
      |v2 AS (SELECT c_custkey, 'NEW_' || c_mktsegment AS segment,
      |    2 AS version
      |  FROM cust WHERE h = 0),
      |versions AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
      |cur AS (SELECT c_custkey, MAX(version) AS max_v
      |  FROM versions GROUP BY 1),
      |rows0 AS (SELECT v.*, c.max_v, v.version = c.max_v AS is_current
      |  FROM versions v JOIN cur c USING (c_custkey)),
      |curseg AS (SELECT c_custkey, segment AS current_segment
      |  FROM rows0 WHERE is_current),
      |prevseg AS (SELECT c_custkey, segment AS prev_segment
      |  FROM rows0 WHERE version = 1 AND max_v = 2)
      |SELECT r.segment, r.is_current, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN cs.current_segment <> r.segment THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_superseded,
      |  CAST(SUM(CASE WHEN ps.prev_segment IS NOT NULL THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_with_prior
      |FROM rows0 r JOIN curseg cs USING (c_custkey)
      |  LEFT JOIN prevseg ps ON ps.c_custkey = r.c_custkey
      |GROUP BY 1, 2 ORDER BY segment, is_current""".stripMargin

  // ------------------------------------------------------------------
  // ann_multiprobe_lsh — query-side multiprobe: with only 3 bands of
  // 6 sign-bits each (half the tables of ann_lsh_topk), the query
  // probes its exact bucket PLUS every 1-bit-flipped neighbor per
  // band (3×7 = 21 probes). A vector that lands one plane on the
  // wrong side of the boundary — the dominant LSH miss mode — is
  // still found, so fewer tables buy the same recall: the index
  // memory/recall trade every production LSH deployment tunes. All
  // float math stays in Spark expressions (the query signature is
  // computed by the SAME bucketSignature plan on a one-row frame);
  // flips are pure bit ops. Candidates rank by exact cosine.
  // ------------------------------------------------------------------
  private val annMultiprobe: QFn = (s, dir) => {
    val all = t(s, dir, "embeddings")
    val corpus = all.filter(col("vec_id") =!= 0)
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0)
    graft.textops.Similarity.lshMultiprobeTopK(corpus, "vec_id",
        "embedding", q, k = 10, dim = 64, bands = 3, planesPerBand = 6)
      .select(col("vec_id"), round(col("score"), 6).as("score_r"))
      .orderBy(col("score_r").desc, col("vec_id"))
  }
  private val annMultiprobeSql = {
    def sqlArr(p: Array[Double]): String =
      p.mkString("[", ", ", "]") + "::DOUBLE[]"
    val planeRows = (0 until 3).flatMap { b =>
      graft.textops.Similarity.hyperplanes(64, 6, 42L + b)
        .zipWithIndex.map { case (p, i) => s"($b, ${1L << i}, ${sqlArr(p)})" }
    }.mkString(",\n    ")
    val flipRows = (0 until 6).map(i => s"(${1L << i})").mkString(", ")
    s"""WITH planes(band, mult, w) AS (VALUES
       |    $planeRows),
       |flips(m) AS (VALUES $flipRows),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qx FROM embeddings
       |  WHERE vec_id = 0),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
       |  FROM embeddings WHERE vec_id <> 0),
       |vsig AS (SELECT vec_id, band,
       |  SUM(CASE WHEN list_dot_product(x, w) >= 0 THEN mult ELSE 0 END)
       |    AS sig
       |  FROM v CROSS JOIN planes GROUP BY 1, 2),
       |qsig AS (SELECT band,
       |  SUM(CASE WHEN list_dot_product(qx, w) >= 0 THEN mult ELSE 0 END)
       |    AS sig
       |  FROM q CROSS JOIN planes GROUP BY 1),
       |qprobe AS (SELECT band, sig FROM qsig
       |  UNION ALL
       |  SELECT band, CAST(xor(sig, m) AS BIGINT) FROM qsig CROSS JOIN flips),
       |cand AS (SELECT DISTINCT vec_id FROM vsig
       |  JOIN qprobe USING (band, sig)),
       |sc AS (SELECT v.vec_id,
       |    round(list_dot_product(v.x, q.qx)
       |      / NULLIF(sqrt(list_dot_product(v.x, v.x))
       |        * sqrt(list_dot_product(q.qx, q.qx)), 0.0), 6) AS score_r
       |  FROM v JOIN cand USING (vec_id) CROSS JOIN q)
       |SELECT vec_id, score_r FROM sc
       |ORDER BY score_r DESC, vec_id LIMIT 10""".stripMargin
  }

  // ------------------------------------------------------------------
  // p_quality_funnel — the corpus-curation attrition report: four
  // cumulative gates (all docs → English → ≥100 chars → ≥20 words →
  // exact-dedup keeper), each stage reporting survivors, surviving
  // bytes, and percent-of-start. One scan computes every gate flag,
  // one 4-row aggregate stacks the funnel (conditional aggregation —
  // no repeated scans, no self-joins); the md5 keeper choice is the
  // same min-doc_id rule the dedup family uses. The first dashboard
  // any 100-TB ingest pipeline ships.
  // ------------------------------------------------------------------
  private val pQualityFunnel: QFn = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.textops.TextFunctions.wsTokenCount(col("text"))
          .as("n_words"),
        md5(col("text")).as("fp"))
    val keeper = d.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
    val flags = d.join(keeper, "fp")
      .select(col("doc_id"), col("n_chars"),
        (col("lang") === "en").as("g1"),
        (col("lang") === "en" && col("n_chars") >= 100).as("g2"),
        (col("lang") === "en" && col("n_chars") >= 100 &&
          col("n_words") >= 20).as("g3"),
        (col("lang") === "en" && col("n_chars") >= 100 &&
          col("n_words") >= 20 && col("doc_id") === col("keep_id"))
          .as("g4"))
    val start = flags.count().toDouble
    def stage(no: Int, name: String, g: Column) =
      flags.filter(g).agg(lit(no).as("stage_no"),
        lit(name).as("stage"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars_sum"))
    stage(0, "all", lit(true))
      .unionByName(stage(1, "lang_en", col("g1")))
      .unionByName(stage(2, "min_chars_100", col("g2")))
      .unionByName(stage(3, "min_words_20", col("g3")))
      .unionByName(stage(4, "exact_dedup", col("g4")))
      .withColumn("pct_of_start_r",
        round(col("n_docs").cast("double") / lit(start), 6))
      .orderBy("stage_no")
  }
  private val pQualityFunnelSql = {
    val nw = graft.textops.TextFunctions.wsTokenCountSql("text")
    s"""WITH d AS (SELECT doc_id, lang, n_chars, $nw AS n_words,
       |    md5(text) AS fp
       |  FROM documents),
       |keeper AS (SELECT fp, MIN(doc_id) AS keep_id FROM d GROUP BY 1),
       |flags AS (SELECT d.doc_id, d.n_chars,
       |    d.lang = 'en' AS g1,
       |    d.lang = 'en' AND d.n_chars >= 100 AS g2,
       |    d.lang = 'en' AND d.n_chars >= 100 AND d.n_words >= 20 AS g3,
       |    d.lang = 'en' AND d.n_chars >= 100 AND d.n_words >= 20
       |      AND d.doc_id = k.keep_id AS g4
       |  FROM d JOIN keeper k USING (fp)),
       |start AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n0 FROM flags),
       |st AS (
       |  SELECT 0 AS stage_no, 'all' AS stage, COUNT(*) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum FROM flags
       |  UNION ALL SELECT 1, 'lang_en', COUNT(*),
       |    CAST(SUM(n_chars) AS BIGINT) FROM flags WHERE g1
       |  UNION ALL SELECT 2, 'min_chars_100', COUNT(*),
       |    CAST(SUM(n_chars) AS BIGINT) FROM flags WHERE g2
       |  UNION ALL SELECT 3, 'min_words_20', COUNT(*),
       |    CAST(SUM(n_chars) AS BIGINT) FROM flags WHERE g3
       |  UNION ALL SELECT 4, 'exact_dedup', COUNT(*),
       |    CAST(SUM(n_chars) AS BIGINT) FROM flags WHERE g4)
       |SELECT stage_no, stage, n_docs, n_chars_sum,
       |  round(CAST(n_docs AS DOUBLE) / (SELECT n0 FROM start), 6)
       |    AS pct_of_start_r
       |FROM st ORDER BY stage_no""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "i27_scd6" -> i27Scd6,
    "ann_multiprobe_lsh" -> annMultiprobe,
    "p_quality_funnel" -> pQualityFunnel)

  val oracleSql: Map[String, String] = Map(
    "i27_scd6" -> i27Scd6Sql,
    "ann_multiprobe_lsh" -> annMultiprobeSql,
    "p_quality_funnel" -> pQualityFunnelSql)
}
