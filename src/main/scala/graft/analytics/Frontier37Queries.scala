package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-fifth pack: personalized PageRank (the
  * restart-at-the-seed variant behind "related items" — same sparse
  * iteration discipline as g_pagerank, different teleport vector),
  * monthly percentile bands (the p10/p50/p90 distribution-over-time
  * panel that catches shape changes a mean line hides), and the
  * trimmed mean (drop-the-tails robust location, the complement of
  * a23's clamp-the-tails winsorized mean).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier37Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // g_ppr — personalized PageRank from the highest-degree part (the
  // deterministic seed): 3 damped iterations π ← 0.15·e_seed +
  // 0.85·πP over the co-purchase graph, every per-edge contribution
  // rounded once and frozen as DECIMAL(18,9) so the sparse sums are
  // order-free (the g_pagerank discipline with a one-hot teleport).
  // Dangling mass redistributes to the seed — the standard PPR
  // absorption. Output: the top-10 most-related parts by final
  // score via the two-phase rankTopK, seed excluded. This is the
  // "customers who bought X" engine expressed declaratively.
  // ------------------------------------------------------------------
  private val gPpr: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2).select(col("pa"), col("pb"))
      .localCheckpoint(true)
    val e = e0.unionAll(e0.select(col("pb").as("pa"), col("pa").as("pb")))
      .localCheckpoint(true)
    val deg = e.groupBy(col("pa").as("v")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val seed = graft.operators.TopK.rankTopK(deg, 1,
        Seq(col("deg").desc, col("v").asc), "rk")
      .filter(col("rk") === 1).select(col("v").as("seed"))
      .localCheckpoint(true)
    // pi0 = one-hot on the seed
    val pi0 = deg.join(broadcast(seed), col("v") === col("seed"), "left")
      .select(col("v"),
        when(col("seed").isNotNull, lit(BigDecimal(1)))
          .otherwise(lit(BigDecimal(0)))
          .cast(DecimalType(18, 9)).as("pi"))
    def step(pi: DataFrame): DataFrame = {
      val spread = e
        .join(pi.select(col("v").as("pa"), col("pi").as("pv")), "pa")
        .join(deg.select(col("v").as("pa"), col("deg")), "pa")
        .select(col("pb").as("v"),
          round((col("pv").cast("double") / col("deg").cast("double")) *
            0.85, 9).cast(DecimalType(18, 9)).as("m"))
        .groupBy("v").agg(sum(col("m")).as("inflow"))
      // total inflow mass; the 1 - mass residue (teleport + rounding +
      // dangling) returns to the seed
      val massRow = spread.agg(sum(col("inflow")).as("mass"))
      deg.select(col("v"))
        .join(spread, Seq("v"), "left")
        .crossJoin(broadcast(massRow))
        .join(broadcast(seed), col("v") === col("seed"), "left")
        .select(col("v"),
          (coalesce(col("inflow"), lit(BigDecimal(0))
            .cast(DecimalType(18, 9))) +
           when(col("seed").isNotNull,
             (lit(BigDecimal(1)).cast(DecimalType(28, 9)) - col("mass"))
               .cast(DecimalType(18, 9)))
             .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 9))))
            .cast(DecimalType(18, 9)).as("pi"))
    }
    val pi3 = step(step(step(pi0)))
    val scored = pi3.join(broadcast(seed), col("v") === col("seed"),
        "left_anti")
      .select(col("v").as("l_partkey"),
        round(col("pi").cast("double"), 9).as("ppr_r"))
    graft.operators.TopK.rankTopK(scored, 10,
        Seq(col("ppr_r").desc, col("l_partkey").asc), "rnk")
      .select(col("rnk"), col("l_partkey"), col("ppr_r"))
      .orderBy("rnk", "l_partkey")
  }
  private val gPprSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM op a JOIN op b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa, pb FROM e0 UNION ALL SELECT pb, pa FROM e0),
      |deg AS (SELECT pa AS v, COUNT(*) AS deg FROM e GROUP BY 1),
      |seed AS (SELECT v AS seed FROM deg
      |  QUALIFY rank() OVER (ORDER BY deg DESC, v) = 1),
      |pi0 AS (SELECT deg.v,
      |    CAST(CASE WHEN seed.seed IS NOT NULL THEN 1 ELSE 0 END
      |      AS DECIMAL(18,9)) AS pi
      |  FROM deg LEFT JOIN seed ON seed.seed = deg.v),
      |sp1 AS (SELECT e.pb AS v,
      |    SUM(CAST(round((CAST(pi0.pi AS DOUBLE)
      |      / CAST(deg.deg AS DOUBLE)) * 0.85, 9) AS DECIMAL(18,9)))
      |      AS inflow
      |  FROM e JOIN pi0 ON pi0.v = e.pa
      |  JOIN deg ON deg.v = e.pa GROUP BY 1),
      |m1 AS (SELECT SUM(inflow) AS mass FROM sp1),
      |pi1 AS (SELECT deg.v,
      |    CAST(COALESCE(sp1.inflow, 0)
      |      + CASE WHEN seed.seed IS NOT NULL
      |        THEN CAST(1 - m1.mass AS DECIMAL(18,9)) ELSE 0 END
      |      AS DECIMAL(18,9)) AS pi
      |  FROM deg LEFT JOIN sp1 ON sp1.v = deg.v
      |  CROSS JOIN m1 LEFT JOIN seed ON seed.seed = deg.v),
      |sp2 AS (SELECT e.pb AS v,
      |    SUM(CAST(round((CAST(pi1.pi AS DOUBLE)
      |      / CAST(deg.deg AS DOUBLE)) * 0.85, 9) AS DECIMAL(18,9)))
      |      AS inflow
      |  FROM e JOIN pi1 ON pi1.v = e.pa
      |  JOIN deg ON deg.v = e.pa GROUP BY 1),
      |m2 AS (SELECT SUM(inflow) AS mass FROM sp2),
      |pi2 AS (SELECT deg.v,
      |    CAST(COALESCE(sp2.inflow, 0)
      |      + CASE WHEN seed.seed IS NOT NULL
      |        THEN CAST(1 - m2.mass AS DECIMAL(18,9)) ELSE 0 END
      |      AS DECIMAL(18,9)) AS pi
      |  FROM deg LEFT JOIN sp2 ON sp2.v = deg.v
      |  CROSS JOIN m2 LEFT JOIN seed ON seed.seed = deg.v),
      |sp3 AS (SELECT e.pb AS v,
      |    SUM(CAST(round((CAST(pi2.pi AS DOUBLE)
      |      / CAST(deg.deg AS DOUBLE)) * 0.85, 9) AS DECIMAL(18,9)))
      |      AS inflow
      |  FROM e JOIN pi2 ON pi2.v = e.pa
      |  JOIN deg ON deg.v = e.pa GROUP BY 1),
      |m3 AS (SELECT SUM(inflow) AS mass FROM sp3),
      |pi3 AS (SELECT deg.v,
      |    CAST(COALESCE(sp3.inflow, 0)
      |      + CASE WHEN seed.seed IS NOT NULL
      |        THEN CAST(1 - m3.mass AS DECIMAL(18,9)) ELSE 0 END
      |      AS DECIMAL(18,9)) AS pi
      |  FROM deg LEFT JOIN sp3 ON sp3.v = deg.v
      |  CROSS JOIN m3 LEFT JOIN seed ON seed.seed = deg.v),
      |sc AS (SELECT pi3.v AS l_partkey,
      |    round(CAST(pi3.pi AS DOUBLE), 9) AS ppr_r
      |  FROM pi3 LEFT JOIN seed ON seed.seed = pi3.v
      |  WHERE seed.seed IS NULL),
      |rk AS (SELECT CAST(rank() OVER (ORDER BY ppr_r DESC, l_partkey)
      |      AS INT) AS rnk, l_partkey, ppr_r
      |  FROM sc)
      |SELECT rnk, l_partkey, ppr_r FROM rk WHERE rnk <= 10
      |ORDER BY rnk, l_partkey""".stripMargin

  // ------------------------------------------------------------------
  // w41_percentile_bands — the distribution-over-time panel: exact
  // interpolated p10/p50/p90 of order price per month plus the
  // p90/p10 spread ratio. Means hide shape; bands show variance
  // regime changes. One percentile aggregate per month group —
  // at 100 TB the same panel runs on approx_percentile with
  // identical plan shape (the a_percentiles corridor discipline).
  // ------------------------------------------------------------------
  private val w41PercentileBands: QFn = (s, dir) => {
    t(s, dir, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        expr("percentile(o_totalprice, 0.1)").as("p10"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .select(col("mon"), col("n_orders"),
        round(col("p10"), 4).as("p10_r"), round(col("p50"), 4)
          .as("p50_r"), round(col("p90"), 4).as("p90_r"),
        round(col("p90") / col("p10"), 6).as("spread_r"))
      .orderBy("mon")
  }
  private val w41PercentileBandsSql =
    """SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate)
      |    AS BIGINT) AS mon,
      |  COUNT(*) AS n_orders,
      |  round(quantile_cont(o_totalprice, 0.1), 4) AS p10_r,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_r,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_r,
      |  round(quantile_cont(o_totalprice, 0.9)
      |    / quantile_cont(o_totalprice, 0.1), 6) AS spread_r
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // a58_trimmed_mean — 5% two-sided trimmed mean of order price per
  // segment: values strictly inside the exact (p5, p95) interpolated
  // fences average in exact decimal; the raw mean rides alongside so
  // the TRIM EFFECT (how much the tails were pulling) is visible.
  // Complement of a23's winsorized mean — trimming drops what
  // winsorizing clamps. Two key-partitioned passes over one shuffle
  // key.
  // ------------------------------------------------------------------
  private val a58TrimmedMean: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("tp"))
    val fences = o.groupBy(col("c_mktsegment").as("seg"))
      .agg(expr("percentile(CAST(tp AS DOUBLE), 0.05)").as("lo"),
        expr("percentile(CAST(tp AS DOUBLE), 0.95)").as("hi"))
    o.join(broadcast(fences), col("c_mktsegment") === col("seg"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("tp")).as("s_all"),
        sum(when(col("tp").cast("double") > col("lo") &&
          col("tp").cast("double") < col("hi"), col("tp"))).as("s_trim"),
        sum(when(col("tp").cast("double") > col("lo") &&
          col("tp").cast("double") < col("hi"), 1L).otherwise(0L))
          .as("n_trim"))
      .select(col("c_mktsegment"), col("n").cast("long").as("n"),
        col("n_trim").cast("long").as("n_kept"),
        round(col("s_all").cast("double") / col("n").cast("double"), 4)
          .as("raw_mean_r"),
        round(col("s_trim").cast("double") /
          col("n_trim").cast("double"), 4).as("trimmed_mean_r"))
      .orderBy("c_mktsegment")
  }
  private val a58TrimmedMeanSql =
    """WITH o AS (SELECT c_mktsegment,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS tp
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |f AS (SELECT c_mktsegment AS seg,
      |    quantile_cont(CAST(tp AS DOUBLE), 0.05) AS lo,
      |    quantile_cont(CAST(tp AS DOUBLE), 0.95) AS hi
      |  FROM o GROUP BY 1)
      |SELECT o.c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN CAST(tp AS DOUBLE) > f.lo
      |    AND CAST(tp AS DOUBLE) < f.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  round(CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
      |    AS raw_mean_r,
      |  round(CAST(SUM(CASE WHEN CAST(tp AS DOUBLE) > f.lo
      |      AND CAST(tp AS DOUBLE) < f.hi THEN tp END) AS DOUBLE)
      |    / CAST(SUM(CASE WHEN CAST(tp AS DOUBLE) > f.lo
      |      AND CAST(tp AS DOUBLE) < f.hi THEN 1 ELSE 0 END)
      |      AS DOUBLE), 4) AS trimmed_mean_r
      |FROM o JOIN f ON o.c_mktsegment = f.seg
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "g_ppr" -> gPpr,
    "w41_percentile_bands" -> w41PercentileBands,
    "a58_trimmed_mean" -> a58TrimmedMean)

  val oracleSql: Map[String, String] = Map(
    "g_ppr" -> gPprSql,
    "w41_percentile_bands" -> w41PercentileBandsSql,
    "a58_trimmed_mean" -> a58TrimmedMeanSql)
}
