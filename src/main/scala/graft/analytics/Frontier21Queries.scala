package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, ninth pack: decile lift/gains charting (the
  * model-targeting report every campaign review opens with —
  * backtested here as prior-spend → future-buyer), graph community
  * conductance (the cut-quality metric complementing g_modularity's
  * density view), and Theil-index inequality decomposition (the
  * entropy inequality measure that splits EXACTLY into within- +
  * between-group terms — the property Gini lacks).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier21Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // q36_decile_lift — gains chart for a backtested targeting score:
  // customers score on PRE-1998 spend, the outcome is whether they
  // ordered in 1998+, and the chart reports per-decile capture of
  // all future buyers plus cumulative lift over random targeting.
  // Deciles come from exact interpolated percentile boundaries (the
  // a_percentiles/b2 engine-shared definition) — NO global ntile
  // sort; rows bucket by comparing against the broadcast 9-boundary
  // array, so the scan stays embarrassingly parallel at any scale.
  // Cumulative sums run on the 10-row decile aggregate. Decile 9 =
  // highest scores; a healthy score concentrates buyers there.
  // ------------------------------------------------------------------
  private val q36DecileLift: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val cust = o.groupBy(col("o_custkey"))
      .agg(sum(when(year(col("o_orderdate")) < 1998,
          col("o_totalprice").cast(DecimalType(18, 4))))
          .as("pre_spend"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("buyer"))
      .filter(col("pre_spend").isNotNull)
      .localCheckpoint(true)
    val deciles = (1 to 9).map(_ / 10.0)
    val bounds = cust.agg(expr(
      s"percentile(CAST(pre_spend AS DOUBLE), array(${deciles.mkString(", ")}))")
      .as("bounds"))
    val bucketed = cust.crossJoin(broadcast(bounds))
      .select(size(filter(col("bounds"),
        b => b <= col("pre_spend").cast("double"))).as("decile"),
        col("buyer"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_custs"),
        sum(col("buyer")).cast("long").as("n_buyers"))
    val tot = bucketed.agg(sum(col("n_custs")).as("nt"),
      sum(col("n_buyers")).as("bt"))
    val wCum = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.crossJoin(broadcast(tot))
      .withColumn("cum_custs", sum(col("n_custs")).over(wCum))
      .withColumn("cum_buyers", sum(col("n_buyers")).over(wCum))
      .select(col("decile"), col("n_custs"), col("n_buyers"),
        round(col("n_buyers").cast("double") /
          col("bt").cast("double"), 6).as("capture_r"),
        round((col("cum_buyers").cast("double") /
            col("bt").cast("double")) /
          (col("cum_custs").cast("double") /
            col("nt").cast("double")), 6).as("cum_lift_r"))
      .orderBy(col("decile").desc)
  }
  private val q36DecileLiftSql =
    """WITH cust AS (SELECT o_custkey,
      |    SUM(CASE WHEN year(o_orderdate) < 1998
      |      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS pre_spend,
      |    MAX(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
      |      AS buyer
      |  FROM orders GROUP BY 1),
      |c2 AS (SELECT * FROM cust WHERE pre_spend IS NOT NULL),
      |b AS (SELECT quantile_cont(CAST(pre_spend AS DOUBLE),
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
      |  FROM c2),
      |bk AS (SELECT
      |    CAST(len(list_filter(b.bounds,
      |      x -> x <= CAST(c2.pre_spend AS DOUBLE))) AS INT) AS decile,
      |    c2.buyer
      |  FROM c2 CROSS JOIN b),
      |agg AS (SELECT decile, COUNT(*) AS n_custs,
      |    CAST(SUM(buyer) AS BIGINT) AS n_buyers
      |  FROM bk GROUP BY 1),
      |tot AS (SELECT SUM(n_custs) AS nt, SUM(n_buyers) AS bt FROM agg)
      |SELECT agg.decile, agg.n_custs, agg.n_buyers,
      |  round(CAST(agg.n_buyers AS DOUBLE) / CAST(tot.bt AS DOUBLE), 6)
      |    AS capture_r,
      |  round((CAST(SUM(agg.n_buyers) OVER wc AS DOUBLE)
      |      / CAST(tot.bt AS DOUBLE))
      |    / (CAST(SUM(agg.n_custs) OVER wc AS DOUBLE)
      |      / CAST(tot.nt AS DOUBLE)), 6) AS cum_lift_r
      |FROM agg CROSS JOIN tot
      |WINDOW wc AS (ORDER BY agg.decile DESC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY agg.decile DESC""".stripMargin

  // ------------------------------------------------------------------
  // g_conductance — cut quality of the nation partition of the
  // customer co-order graph (customers linked when they order the
  // same part, ≥2 shared parts): for each nation-community,
  // conductance φ = cut / min(vol, vol_total − vol) — low φ means
  // the community's edges stay inside it. Edge generation is the
  // per-part neighbor join capped at 20 customers per part (hub
  // bounding, the g_two_hop discipline); cut/volume counting is two
  // groupBys on the edge list with nation labels broadcast from the
  // customer dim. Every φ is ONE rounded double over exact integer
  // cut/volume counts.
  // ------------------------------------------------------------------
  private val gConductance: QFn = (s, dir) => {
    val co = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    // cap per-part fan-out: top-20 customers by key (deterministic)
    val capped = co
      .withColumn("rn", row_number().over(Window.partitionBy("p")
        .orderBy(col("c").asc)))
      .filter(col("rn") <= 20)
      .select(col("p"), col("c"))
    val e0 = capped.select(col("p"), col("c").as("ca"))
      .join(capped.select(col("p"), col("c").as("cb")), "p")
      .filter(col("ca") < col("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .localCheckpoint(true)
    val nat = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val e = e0
      .join(broadcast(nat.select(col("c_custkey").as("ca"),
        col("c_nationkey").as("na"))), "ca")
      .join(broadcast(nat.select(col("c_custkey").as("cb"),
        col("c_nationkey").as("nb"))), "cb")
    // volume per community counts both endpoints; cut edges cross
    val vol = e.select(col("na").as("nk"), col("nb")).unionAll(
        e.select(col("nb").as("nk"), col("na").as("nb")))
      .groupBy("nk")
      .agg(count(lit(1)).as("vol"),
        sum(when(col("nk") =!= col("nb"), 1L).otherwise(0L)).as("cut"))
    val tot = vol.agg(sum(col("vol")).as("vt"))
    vol.crossJoin(broadcast(tot))
      .join(broadcast(t(s, dir, "nation")),
        col("nk") === col("n_nationkey"))
      .select(col("n_name"), col("vol").cast("long").as("volume"),
        col("cut").cast("long").as("cut_edges"),
        round(col("cut").cast("double") /
          least(col("vol"), col("vt") - col("vol")).cast("double"), 6)
          .as("conductance_r"))
      .orderBy("n_name")
  }
  private val gConductanceSql =
    """WITH co AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |capped AS (SELECT p, c FROM co
      |  QUALIFY row_number() OVER (PARTITION BY p ORDER BY c) <= 20),
      |e0 AS (SELECT a.c AS ca, b.c AS cb, COUNT(*) AS n_shared
      |  FROM capped a JOIN capped b ON a.p = b.p AND a.c < b.c
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT e0.ca, e0.cb, x.c_nationkey AS na,
      |    y.c_nationkey AS nb
      |  FROM e0 JOIN customer x ON x.c_custkey = e0.ca
      |  JOIN customer y ON y.c_custkey = e0.cb),
      |vol AS (SELECT nk, COUNT(*) AS vol,
      |    CAST(SUM(CASE WHEN nk <> nb THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cut
      |  FROM (SELECT na AS nk, nb FROM e
      |        UNION ALL SELECT nb, na FROM e)
      |  GROUP BY 1),
      |tot AS (SELECT SUM(vol) AS vt FROM vol)
      |SELECT n_name, CAST(vol.vol AS BIGINT) AS volume,
      |  vol.cut AS cut_edges,
      |  round(CAST(vol.cut AS DOUBLE)
      |    / CAST(least(vol.vol, tot.vt - vol.vol) AS DOUBLE), 6)
      |    AS conductance_r
      |FROM vol CROSS JOIN tot
      |JOIN nation ON nk = n_nationkey
      |ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------------
  // a45_theil_decomposition — Theil-T inequality of order prices,
  // decomposed by nation: T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ)
  // holds EXACTLY (up to the frozen rounding) — within-group
  // inequality plus between-group inequality reconstruct the total,
  // the additivity that makes entropy measures auditable where Gini
  // is not. Per-order terms (x/μ_g)·ln(x/μ_g)... aggregate per
  // nation from exact decimal sums: each order contributes ONE
  // rounded ln term frozen as DECIMAL(18,6), group means are exact
  // ratios, and the final assembly runs on the 25-row group table.
  // Output: per-nation share/within/between plus the 'ALL' row
  // carrying T, T_within, T_between.
  // ------------------------------------------------------------------
  private val a45TheilDecomposition: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_totalprice")
        .cast(DecimalType(18, 4)).as("x"))
    val grp = o.groupBy("n_name")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
      .localCheckpoint(true)
    val tot = grp.agg(sum(col("ng")).as("nt"),
      sum(col("sg")).cast(DecimalType(38, 4)).as("st"))
    // per-order entropy term against the GROUP mean: Σ x·ln(x/μ_g)
    val terms = o.join(broadcast(grp), "n_name")
      .select(col("n_name"),
        round(col("x").cast("double") *
          log(col("x").cast("double") /
            (col("sg").cast("double") / col("ng").cast("double"))), 6)
          .cast(DecimalType(18, 6)).as("xlx"))
      .groupBy("n_name").agg(sum(col("xlx")).as("sxlx"))
    val assembled = grp.join(terms, "n_name").crossJoin(broadcast(tot))
      .select(col("n_name"),
        round(col("sg").cast("double") / col("st").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("share"),
        // T_g = Σ x·ln(x/μ_g) / S_g
        round(col("sxlx").cast("double") / col("sg").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("within"),
        // between term: s_g · ln(μ_g/μ)
        round((col("sg").cast("double") / col("st").cast("double")) *
          log((col("sg").cast("double") / col("ng").cast("double")) /
            (col("st").cast("double") / col("nt").cast("double"))), 6)
          .cast(DecimalType(18, 6)).as("between"))
      .localCheckpoint(true)
    val allRow = assembled.agg(
        sum(col("share") * col("within")).as("tw"),
        sum(col("between")).as("tb"))
      .select(lit("ALL").as("n_name"),
        lit(BigDecimal(1)).cast(DecimalType(18, 6)).as("share"),
        round((col("tw") + col("tb")).cast("double"), 6)
          .cast(DecimalType(18, 6)).as("within"),
        round(col("tb").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("between"))
    assembled.unionByName(allRow)
      .select(col("n_name"), col("share").cast("string").as("share"),
        col("within").cast("string").as("within"),
        col("between").cast("string").as("between"))
      .orderBy("n_name")
  }
  private val a45TheilDecompositionSql =
    """WITH o AS (SELECT n_name,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |grp AS (SELECT n_name, COUNT(*) AS ng, SUM(x) AS sg
      |  FROM o GROUP BY 1),
      |tot AS (SELECT SUM(ng) AS nt, CAST(SUM(sg) AS DECIMAL(38,4)) AS st
      |  FROM grp),
      |terms AS (SELECT o.n_name,
      |    CAST(round(CAST(o.x AS DOUBLE)
      |      * ln(CAST(o.x AS DOUBLE)
      |        / (CAST(grp.sg AS DOUBLE) / CAST(grp.ng AS DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS xlx
      |  FROM o JOIN grp ON grp.n_name = o.n_name),
      |sx AS (SELECT n_name, SUM(xlx) AS sxlx FROM terms GROUP BY 1),
      |asm AS (SELECT grp.n_name,
      |    CAST(round(CAST(grp.sg AS DOUBLE) / CAST(tot.st AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS share,
      |    CAST(round(CAST(sx.sxlx AS DOUBLE) / CAST(grp.sg AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS within,
      |    CAST(round((CAST(grp.sg AS DOUBLE) / CAST(tot.st AS DOUBLE))
      |      * ln((CAST(grp.sg AS DOUBLE) / CAST(grp.ng AS DOUBLE))
      |        / (CAST(tot.st AS DOUBLE) / CAST(tot.nt AS DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS between
      |  FROM grp JOIN sx ON sx.n_name = grp.n_name CROSS JOIN tot),
      |allrow AS (SELECT 'ALL' AS n_name,
      |    CAST(1 AS DECIMAL(18,6)) AS share,
      |    CAST(round(CAST(SUM(share * within) + SUM(between) AS DOUBLE),
      |      6) AS DECIMAL(18,6)) AS within,
      |    CAST(round(CAST(SUM(between) AS DOUBLE), 6) AS DECIMAL(18,6))
      |      AS between
      |  FROM asm)
      |SELECT n_name, CAST(share AS VARCHAR) AS share,
      |  CAST(within AS VARCHAR) AS within,
      |  CAST(between AS VARCHAR) AS between
      |FROM (SELECT * FROM asm UNION ALL SELECT * FROM allrow)
      |ORDER BY n_name""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q36_decile_lift" -> q36DecileLift,
    "g_conductance" -> gConductance,
    "a45_theil_decomposition" -> a45TheilDecomposition)

  val oracleSql: Map[String, String] = Map(
    "q36_decile_lift" -> q36DecileLiftSql,
    "g_conductance" -> gConductanceSql,
    "a45_theil_decomposition" -> a45TheilDecompositionSql)
}
