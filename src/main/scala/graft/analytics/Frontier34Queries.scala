package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-second pack: the Kruskal–Wallis k-sample
  * rank test (one shot answers "do ANY of the five segments differ?"
  * — the multi-group extension of the Mann–Whitney entry, on the
  * same exact-midrank machinery as ml_roc_auc), importance-sampling
  * weights with effective sample size (the reweighting report that
  * says what a corpus rebalance actually costs in statistical
  * power), and the rich-club coefficient (do the highest-degree
  * parts preferentially interconnect? — Zhou & Mondragón 2004).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier34Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a54_kruskal_wallis — rank-based k-sample location test on order
  // price across the five market segments: H = 12/(N(N+1)) ·
  // Σ R²ᵢ/nᵢ − 3(N+1), midranks exact half-integers in DECIMAL
  // (ties share the average rank — with the standard tie correction
  // divisor 1 − Σ(t³−t)/(N³−N)). H ≈ χ²₄ under H₀; H > 9.488 rejects
  // at 5%. Midranks come from the two-phase operators/Midrank (keyed
  // shuffles + range-partitioned prefix sum — NO global window, no
  // single-partition funnel) + per-segment exact sums.
  // ------------------------------------------------------------------
  private val a54KruskalWallis: QFn = (s, dir) => {
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("x"))
    val ranked = graft.operators.Midrank.attach(rows, col("x"), "mr")
      .select(col("g"), col("mr"))
    val per = ranked.groupBy("g")
      .agg(count(lit(1)).cast("long").as("ni"),
        sum(col("mr")).cast(DecimalType(38, 1)).as("ri"))
    val ties = rows.groupBy("x").agg(count(lit(1)).as("t"))
      .agg(sum((col("t") * col("t") * col("t") - col("t"))
        .cast(DecimalType(38, 0))).as("tsum"))
    val tot = per.agg(sum(col("ni")).cast("long").as("nt"))
    val hRaw = per.crossJoin(broadcast(tot))
      .select(col("nt"),
        round((col("ri") * col("ri")).cast("double") /
          col("ni").cast("double"), 4).cast(DecimalType(38, 4))
          .as("r2n"))
      .groupBy("nt").agg(sum(col("r2n")).as("sr2n"))
    hRaw.crossJoin(broadcast(ties))
      .select(col("nt").as("n_total"),
        round(
          (lit(12.0) / (col("nt").cast("double") *
            (col("nt").cast("double") + 1)) *
            col("sr2n").cast("double") -
            lit(3.0) * (col("nt").cast("double") + 1)) /
          (lit(1.0) - col("tsum").cast("double") /
            (col("nt").cast("double") * col("nt").cast("double") *
             col("nt").cast("double") - col("nt").cast("double"))), 6)
          .as("h_r"))
      .select(col("n_total"), col("h_r"),
        (col("h_r") > 9.487729).as("reject_5pct"))
  }
  private val a54KruskalWallisSql =
    """WITH rows0 AS (SELECT c_mktsegment AS g,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |rk AS (SELECT g,
      |    CAST(rank() OVER (ORDER BY x) AS DECIMAL(28,1))
      |      + (CAST(COUNT(*) OVER (PARTITION BY x) AS DECIMAL(28,1))
      |          - 1) / 2 AS mr
      |  FROM rows0),
      |per AS (SELECT g, COUNT(*) AS ni,
      |    CAST(SUM(mr) AS DECIMAL(38,1)) AS ri
      |  FROM rk GROUP BY 1),
      |ties AS (SELECT CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)
      |      AS DECIMAL(38,0)) AS tsum
      |  FROM (SELECT COUNT(*) AS t FROM rows0 GROUP BY x)),
      |tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS nt FROM per),
      |h0 AS (SELECT tot.nt,
      |    SUM(CAST(round(CAST(ri * ri AS DOUBLE)
      |      / CAST(ni AS DOUBLE), 4) AS DECIMAL(38,4))) AS sr2n
      |  FROM per CROSS JOIN tot GROUP BY tot.nt)
      |SELECT h0.nt AS n_total,
      |  round((12.0 / (CAST(h0.nt AS DOUBLE)
      |      * (CAST(h0.nt AS DOUBLE) + 1))
      |    * CAST(CAST(h0.sr2n AS VARCHAR) AS DOUBLE)
      |    - 3.0 * (CAST(h0.nt AS DOUBLE) + 1))
      |    / (1.0 - CAST(CAST(ties.tsum AS VARCHAR) AS DOUBLE)
      |      / (CAST(h0.nt AS DOUBLE) * CAST(h0.nt AS DOUBLE)
      |        * CAST(h0.nt AS DOUBLE) - CAST(h0.nt AS DOUBLE))), 6)
      |    AS h_r,
      |  round((12.0 / (CAST(h0.nt AS DOUBLE)
      |      * (CAST(h0.nt AS DOUBLE) + 1))
      |    * CAST(CAST(h0.sr2n AS VARCHAR) AS DOUBLE)
      |    - 3.0 * (CAST(h0.nt AS DOUBLE) + 1))
      |    / (1.0 - CAST(CAST(ties.tsum AS VARCHAR) AS DOUBLE)
      |      / (CAST(h0.nt AS DOUBLE) * CAST(h0.nt AS DOUBLE)
      |        * CAST(h0.nt AS DOUBLE) - CAST(h0.nt AS DOUBLE))), 6)
      |    > 9.487729 AS reject_5pct
      |FROM h0 CROSS JOIN ties""".stripMargin

  // ------------------------------------------------------------------
  // p_importance_weights — corpus rebalancing accounting: to serve a
  // UNIFORM source mixture from the observed one, each document
  // carries weight w = target_share / observed_share; the effective
  // sample size ESS = (Σw)²/Σw² says how many "real" documents the
  // reweighted corpus is worth — the honest cost of rebalancing
  // (ESS/N → 1 means the mixture was already right). Weights are
  // ONE rounded double frozen per source; Σw and Σw² are exact
  // decimal sums over per-source counts (weights are constant
  // within a source — no per-row math at all).
  // ------------------------------------------------------------------
  private val pImportanceWeights: QFn = (s, dir) => {
    val per = t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tot = per.agg(sum(col("n")).cast("long").as("nt"),
      count(lit(1)).cast("long").as("k"))
    val weighted = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n"), col("nt"), col("k"),
        // w = (nt/k) / n — uniform target share over observed share
        round(col("nt").cast("double") /
          (col("k").cast("double") * col("n").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("w"))
    val ess = weighted
      .select(col("nt"),
        (col("w") * col("n")).cast(DecimalType(38, 10)).as("sw"),
        (col("w") * col("w") * col("n")).cast(DecimalType(38, 12))
          .as("sw2"))
      .groupBy("nt").agg(sum(col("sw")).as("tsw"),
        sum(col("sw2")).as("tsw2"))
      .select(lit("ESS").as("source"), lit(-1L).as("n"),
        lit(null).cast("string").as("w"),
        round((col("tsw").cast("double") * col("tsw").cast("double")) /
          col("tsw2").cast("double"), 4).as("metric_r"),
        round((col("tsw").cast("double") * col("tsw").cast("double")) /
          (col("tsw2").cast("double") * col("nt").cast("double")), 6)
          .as("efficiency_r"))
    weighted.select(col("source"), col("n").cast("long").as("n"),
        col("w").cast("string").as("w"),
        lit(-1.0).as("metric_r"), lit(-1.0).as("efficiency_r"))
      .unionByName(ess)
      .orderBy("source")
  }
  private val pImportanceWeightsSql =
    """WITH per AS (SELECT source, COUNT(*) AS n FROM documents
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
      |    CAST(COUNT(*) AS BIGINT) AS k FROM per),
      |wt AS (SELECT source, n, nt, k,
      |    CAST(round(CAST(nt AS DOUBLE)
      |      / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS w
      |  FROM per CROSS JOIN tot),
      |ess AS (SELECT 'ESS' AS source, CAST(-1 AS BIGINT) AS n,
      |    CAST(NULL AS VARCHAR) AS w,
      |    round((CAST(tsw AS DOUBLE) * CAST(tsw AS DOUBLE))
      |      / CAST(tsw2 AS DOUBLE), 4) AS metric_r,
      |    round((CAST(tsw AS DOUBLE) * CAST(tsw AS DOUBLE))
      |      / (CAST(tsw2 AS DOUBLE) * CAST(nt AS DOUBLE)), 6)
      |      AS efficiency_r
      |  FROM (SELECT nt,
      |      SUM(CAST(w * n AS DECIMAL(38,10))) AS tsw,
      |      SUM(CAST(w * w * n AS DECIMAL(38,12))) AS tsw2
      |    FROM wt GROUP BY nt))
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(w AS VARCHAR) AS w,
      |  -1.0 AS metric_r, -1.0 AS efficiency_r
      |FROM wt
      |UNION ALL SELECT * FROM ess
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // g_rich_club — do hubs interconnect? For the co-purchase graph,
  // restrict to the top-k highest-degree parts (k = 50, degree ties
  // broken on the key) and compare the edge density among them with
  // the whole graph's density: φ(k) = 2·E_club / (k(k−1)) and the
  // normalized ratio vs overall density. Degrees come from the full
  // edge list; the club subgraph is two broadcast semijoins. A ratio
  // ≫ 1 says the "rich" parts form a core — the topology that makes
  // hub-bounding (the cap the wedge joins use) NECESSARY.
  // ------------------------------------------------------------------
  private val gRichClub: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2)
      .select(col("pa"), col("pb"))
      .localCheckpoint(true)
    val deg = e0.select(col("pa").as("v"))
      .unionAll(e0.select(col("pb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val club = graft.operators.TopK.rankTopK(deg, 50,
        Seq(col("deg").desc, col("v").asc), "rk")
      .filter(col("rk") <= 50) // rank ties could exceed 50 — keep all
      .select(col("v"))
      .localCheckpoint(true)
    val kSize = club.count()
    val clubEdges = e0
      .join(club.select(col("v").as("pa")), "pa")
      .join(club.select(col("v").as("pb")), "pb")
      .count()
    val nNodes = deg.count()
    val nEdges = e0.count()
    val phiClub = 2.0 * clubEdges / (kSize.toDouble * (kSize - 1))
    val phiAll = 2.0 * nEdges / (nNodes.toDouble * (nNodes - 1))
    import s.implicits._
    Seq((kSize, clubEdges, nNodes, nEdges,
        BigDecimal(phiClub).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(phiClub / phiAll).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("club_size", "club_edges", "n_nodes", "n_edges",
        "phi_club_r", "rich_club_ratio_r")
  }
  private val gRichClubSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM op a JOIN op b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT v, COUNT(*) AS deg FROM (
      |    SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0)
      |  GROUP BY 1),
      |club AS (SELECT v FROM deg
      |  QUALIFY rank() OVER (ORDER BY deg DESC, v) <= 50),
      |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS ks FROM club),
      |ce AS (SELECT CAST(COUNT(*) AS BIGINT) AS club_edges
      |  FROM e0 JOIN club ca ON ca.v = e0.pa
      |  JOIN club cb ON cb.v = e0.pb),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
      |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e0)
      |SELECT k.ks AS club_size, ce.club_edges, nn.n_nodes, ne.n_edges,
      |  round(2.0 * CAST(ce.club_edges AS DOUBLE)
      |    / (CAST(k.ks AS DOUBLE) * (CAST(k.ks AS DOUBLE) - 1)), 6)
      |    AS phi_club_r,
      |  round((2.0 * CAST(ce.club_edges AS DOUBLE)
      |      / (CAST(k.ks AS DOUBLE) * (CAST(k.ks AS DOUBLE) - 1)))
      |    / (2.0 * CAST(ne.n_edges AS DOUBLE)
      |      / (CAST(nn.n_nodes AS DOUBLE)
      |        * (CAST(nn.n_nodes AS DOUBLE) - 1))), 4)
      |    AS rich_club_ratio_r
      |FROM k CROSS JOIN ce CROSS JOIN nn CROSS JOIN ne""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a54_kruskal_wallis" -> a54KruskalWallis,
    "p_importance_weights" -> pImportanceWeights,
    "g_rich_club" -> gRichClub)

  val oracleSql: Map[String, String] = Map(
    "a54_kruskal_wallis" -> a54KruskalWallisSql,
    "p_importance_weights" -> pImportanceWeightsSql,
    "g_rich_club" -> gRichClubSql)
}
