package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, fifteenth pack: exact ROC-AUC via the
  * Mann–Whitney rank identity (the threshold-free score every
  * classifier comparison uses — computed from midranks, no curve
  * integration), embedding-space outlier detection (distance-to-
  * centroid — the curation pass that catches mis-embedded or
  * off-distribution documents), and the Laspeyres price index
  * (base-period-weighted price level per month — the index-number
  * economics of "did prices rise, holding the basket fixed").
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier27Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ml_roc_auc — exact AUC for the prior-spend score against the
  // future-buyer label, through the Mann–Whitney identity
  // AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ sums the positives'
  // MIDRANKS (ties share the average rank — the exact tie-corrected
  // AUC, not an approximation). Midranks come from the two-phase
  // operators/Midrank (per-value tie counts + range-partitioned
  // prefix sum + join-back — NO global window, so the customer axis
  // never funnels through one task): rank r with t ties has midrank
  // r + (t−1)/2, an exact half-integer in DECIMAL. Emits AUC plus the
  // Gini coefficient 2·AUC−1 the credit-scoring world quotes.
  // ------------------------------------------------------------------
  private val mlRocAuc: QFn = (s, dir) => {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(when(year(col("o_orderdate")) < 1998,
          col("o_totalprice").cast(DecimalType(18, 4)))).as("score"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("y"))
      .filter(col("score").isNotNull)
    val ranked = graft.operators.Midrank.attach(cust, col("score"), "mr")
      .select(col("y"), col("mr"))
    val agg = ranked.agg(
      sum(when(col("y") === 1, col("mr"))).as("rpos"),
      sum(col("y")).as("np"),
      sum(lit(1L) - col("y")).as("nn"))
    // one-class data has no ranking problem: report the 0.5 coin-flip
    // convention with both counts visible so the caller sees why
    agg.select(col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        when(col("np") === 0 || col("nn") === 0, lit(0.5))
          .otherwise(round((col("rpos").cast("double") -
            col("np").cast("double") * (col("np").cast("double") + 1)
              / 2) /
            (col("np").cast("double") * col("nn").cast("double")), 6))
          .as("auc_r"))
      .select(col("n_pos"), col("n_neg"), col("auc_r"),
        round(lit(2.0) * col("auc_r") - 1.0, 6).as("gini_r"))
  }
  private val mlRocAucSql =
    """WITH cust AS (SELECT o_custkey,
      |    SUM(CASE WHEN year(o_orderdate) < 1998
      |      THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS score,
      |    MAX(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
      |      AS y
      |  FROM orders GROUP BY 1),
      |c2 AS (SELECT * FROM cust WHERE score IS NOT NULL),
      |rk AS (SELECT y,
      |    CAST(rank() OVER (ORDER BY score) AS DECIMAL(18,1))
      |      + (CAST(COUNT(*) OVER (PARTITION BY score)
      |          AS DECIMAL(18,1)) - 1) / 2 AS mr
      |  FROM c2),
      |agg AS (SELECT SUM(CASE WHEN y = 1 THEN mr END) AS rpos,
      |    SUM(y) AS np, SUM(1 - y) AS nn
      |  FROM rk)
      |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
      |  CASE WHEN np = 0 OR nn = 0 THEN 0.5
      |    ELSE round((CAST(rpos AS DOUBLE)
      |      - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1) / 2)
      |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) END AS auc_r,
      |  round(2.0 * (CASE WHEN np = 0 OR nn = 0 THEN 0.5
      |    ELSE round((CAST(rpos AS DOUBLE)
      |      - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1) / 2)
      |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) END) - 1.0, 6)
      |    AS gini_r
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // t_embedding_outliers — centroid-distance outlier scoring over
  // the embedding table: the corpus centroid is the exact per-dim
  // decimal mean (one rounded double per dim, frozen — the KMeans
  // update step with k=1), each vector's squared distance to it is
  // an exact decimal sum, and the 10 farthest vectors surface via
  // the two-phase rankTopK. Off-distribution embeddings are what a
  // curation pass quarantines before they poison ANN recall or
  // k-means cells. One dim-keyed aggregate + one dim-keyed join —
  // embarrassingly parallel on the vector axis.
  // ------------------------------------------------------------------
  private val tEmbeddingOutliers: QFn = (s, dir) => {
    val pts = graft.ml.KMeans.pointsLong(t(s, dir, "embeddings"))
      .localCheckpoint(true)
    val centroid = pts.groupBy("dim")
      .agg(round(sum(col("vd")).cast("double") / count(lit(1)), 6)
        .cast(DecimalType(18, 6)).as("cd"))
    val d2 = pts.join(broadcast(centroid), "dim")
      .select(col("vec_id"),
        ((col("vd") - col("cd")) * (col("vd") - col("cd")))
          .cast(DecimalType(38, 12)).as("sq"))
      .groupBy("vec_id").agg(sum(col("sq")).as("d2"))
    val scored = d2.select(col("vec_id"),
      round(sqrt(col("d2").cast("double")), 6).as("dist_r"))
    graft.operators.TopK.rankTopK(scored, 10,
        Seq(col("dist_r").desc, col("vec_id").asc), "rnk")
      .select(col("rnk"), col("vec_id"), col("dist_r"))
      .orderBy("rnk", "vec_id")
  }
  private val tEmbeddingOutliersSql =
    """WITH pts AS (SELECT vec_id, dim - 1 AS dim,
      |    CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS vd
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) AS dim
      |    FROM embeddings)),
      |cen AS (SELECT dim,
      |    CAST(round(CAST(SUM(vd) AS DOUBLE) / COUNT(*), 6)
      |      AS DECIMAL(18,6)) AS cd
      |  FROM pts GROUP BY 1),
      |d2 AS (SELECT p.vec_id,
      |    SUM(CAST((p.vd - cen.cd) * (p.vd - cen.cd) AS DECIMAL(38,12)))
      |      AS d2
      |  FROM pts p JOIN cen ON cen.dim = p.dim GROUP BY 1),
      |sc AS (SELECT vec_id,
      |    round(sqrt(CAST(d2 AS DOUBLE)), 6) AS dist_r
      |  FROM d2),
      |rk AS (SELECT CAST(rank() OVER (ORDER BY dist_r DESC, vec_id)
      |      AS INT) AS rnk, vec_id, dist_r
      |  FROM sc)
      |SELECT rnk, vec_id, dist_r FROM rk WHERE rnk <= 10
      |ORDER BY rnk, vec_id""".stripMargin

  // ------------------------------------------------------------------
  // q43_price_index — monthly Laspeyres price index over the part
  // basket: base-period (first month) quantities fix the basket,
  // per-month average unit prices (exact decimal Σprice/Σqty — ONE
  // rounded double frozen per (part, month)) price it, and the index
  // is Σ p_t·q₀ / Σ p₀·q₀ × 100. Parts missing a month drop from
  // both sums that month (matched-sample Laspeyres — the standard
  // practical fix). Everything joins on the part key; month count is
  // bounded, so the index table is data-scale-invariant.
  // ------------------------------------------------------------------
  private val q43PriceIndex: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("pk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mon"),
        col("l_extendedprice").cast(DecimalType(18, 4)).as("ep"),
        col("l_quantity").cast(DecimalType(18, 4)).as("q"))
    val pm = li.groupBy("pk", "mon")
      .agg(round(sum(col("ep")).cast("double") /
          sum(col("q")).cast("double"), 6)
        .cast(DecimalType(18, 6)).as("unit_p"),
        sum(col("q")).as("qty"))
      .localCheckpoint(true)
    val m0 = pm.agg(min(col("mon")).as("mon0"))
    val base = pm.join(broadcast(m0), col("mon") === col("mon0"))
      .select(col("pk"), col("unit_p").as("p0"), col("qty").as("q0"))
    val joined = pm.join(broadcast(base), "pk")
      .select(col("mon"),
        (col("unit_p") * col("q0")).cast(DecimalType(38, 10)).as("ptq0"),
        (col("p0") * col("q0")).cast(DecimalType(38, 10)).as("p0q0"))
      .groupBy("mon")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("ptq0")).as("num"), sum(col("p0q0")).as("den"))
    joined.select(col("mon"), col("n_parts"),
        round(col("num").cast("double") / col("den").cast("double")
          * 100.0, 4).as("laspeyres_r"))
      .orderBy("mon")
  }
  private val q43PriceIndexSql =
    """WITH li AS (SELECT l_partkey AS pk,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) AS ep,
      |    CAST(l_quantity AS DECIMAL(18,4)) AS q
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |pm AS (SELECT pk, mon,
      |    CAST(round(CAST(SUM(ep) AS DOUBLE) / CAST(SUM(q) AS DOUBLE),
      |      6) AS DECIMAL(18,6)) AS unit_p,
      |    SUM(q) AS qty
      |  FROM li GROUP BY 1, 2),
      |m0 AS (SELECT MIN(mon) AS mon0 FROM pm),
      |base AS (SELECT pk, unit_p AS p0, qty AS q0
      |  FROM pm, m0 WHERE mon = mon0),
      |j AS (SELECT pm.mon,
      |    CAST(pm.unit_p * base.q0 AS DECIMAL(38,10)) AS ptq0,
      |    CAST(base.p0 * base.q0 AS DECIMAL(38,10)) AS p0q0
      |  FROM pm JOIN base ON base.pk = pm.pk)
      |SELECT mon, COUNT(*) AS n_parts,
      |  round(CAST(SUM(ptq0) AS DOUBLE) / CAST(SUM(p0q0) AS DOUBLE)
      |    * 100.0, 4) AS laspeyres_r
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ml_roc_auc" -> mlRocAuc,
    "t_embedding_outliers" -> tEmbeddingOutliers,
    "q43_price_index" -> q43PriceIndex)

  val oracleSql: Map[String, String] = Map(
    "ml_roc_auc" -> mlRocAucSql,
    "t_embedding_outliers" -> tEmbeddingOutliersSql,
    "q43_price_index" -> q43PriceIndexSql)
}
