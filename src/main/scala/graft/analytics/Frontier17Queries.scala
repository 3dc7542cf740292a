package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, fifth pack: Zipf-law exponent fitting over the
  * corpus vocabulary (the rank-frequency diagnostic every corpus
  * report plots), grid-bucketed k-nearest-neighbor spatial join (the
  * kNN sibling of geo_radius_join's fixed-radius search), and
  * delete-one-group jackknife variance (Quenouille/Tukey — the
  * resampling-free uncertainty estimate for any plug-in statistic).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL(18,6) before any reordering sum, total ORDER BYs.
  */
object Frontier17Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_zipf_fit — Zipf exponent of the corpus unigram distribution:
  // rank terms by frequency (total tie-break on the term so both
  // engines agree), then OLS-fit ln(freq) against ln(rank). The
  // regression runs on exact decimal sufficient statistics (each
  // per-term ln frozen as DECIMAL(18,6), the five Σ's exact decimal
  // sums); slope/intercept/R² are each ONE rounded double. The rank
  // window is global but over the VOCABULARY axis — corpus text
  // reduces to (term, freq) in one shuffle, and natural-language
  // vocabularies grow sublinearly (Heaps' law), so the windowed table
  // stays tiny at any corpus size. A slope near −1 is the Zipf
  // signature; the synthetic corpus's flat generator shows up as a
  // shallow slope — which is exactly what the diagnostic is FOR.
  // ------------------------------------------------------------------
  private val tZipfFit: QFn = (s, dir) => {
    val terms = t(s, dir, "documents")
      .select(posexplode(split(TF.normText(col("text")), " "))
        .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val ranked = terms
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("freq").desc, col("w").asc)))
      .select(col("w"), col("freq"), col("rnk"),
        round(log(col("rnk").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("x"),
        round(log(col("freq").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("y"))
    val stats = ranked.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx0"),
      sum((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy0"),
      sum((col("y") * col("y")).cast(DecimalType(38, 12))).as("syy0"),
      max(when(col("rnk") === 1, col("w"))).as("top_term"))
    // the a14_linreg shape: exact decimal moments → double ONCE, then a
    // fixed IEEE expression tree both engines evaluate identically
    val n = col("n")
    val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
    val sxx = col("sxx0").cast("double"); val syy = col("syy0").cast("double")
    val sxy = col("sxy0").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    stats.select(n.as("n_terms"), col("top_term"),
      round(slope, 6).as("slope_r"),
      round((sy - slope * sx) / n, 6).as("intercept_r"),
      round(slope * slope * (n * sxx - sx * sx) / (n * syy - sy * sy), 6)
        .as("r2_r"))
  }
  private val tZipfFitSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |tf AS (SELECT w, COUNT(*) AS freq FROM w0
       |  WHERE length(w) > 0 GROUP BY 1),
       |rk AS (SELECT w, freq,
       |    row_number() OVER (ORDER BY freq DESC, w) AS rnk
       |  FROM tf),
       |xy AS (SELECT w, freq, rnk,
       |    CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
       |    CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
       |  FROM rk),
       |st AS (SELECT COUNT(*) AS n, SUM(x) AS sx0, SUM(y) AS sy0,
       |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx0,
       |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy0,
       |    SUM(CAST(y * y AS DECIMAL(38,12))) AS syy0,
       |    MAX(CASE WHEN rnk = 1 THEN w END) AS top_term
       |  FROM xy),
       |d AS (SELECT n, top_term,
       |    CAST(CAST(sx0 AS VARCHAR) AS DOUBLE) AS sx,
       |    CAST(CAST(sy0 AS VARCHAR) AS DOUBLE) AS sy,
       |    CAST(CAST(sxx0 AS VARCHAR) AS DOUBLE) AS sxx,
       |    CAST(CAST(sxy0 AS VARCHAR) AS DOUBLE) AS sxy,
       |    CAST(CAST(syy0 AS VARCHAR) AS DOUBLE) AS syy
       |  FROM st)
       |SELECT n AS n_terms, top_term,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_r,
       |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
       |    / n, 6) AS intercept_r,
       |  round(((n * sxy - sx * sy) / (n * sxx - sx * sx))
       |    * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
       |    * (n * sxx - sx * sx) / (n * syy - sy * sy), 6) AS r2_r
       |FROM d""".stripMargin
  }

  // ------------------------------------------------------------------
  // geo_knn_join — k-nearest-neighbor spatial join (k=3) between the
  // deterministic customer/supplier point sets geo_radius_join
  // established: each customer explodes into its 3×3 neighborhood of
  // 32-unit grid cells, suppliers sit in exactly one cell, so the
  // equi-join on cell id yields each candidate pair once; exact
  // integer squared distance ranks candidates and row_number keeps
  // the top 3 (ties broken on supplier id — total order, both
  // engines agree). This is BOUNDED kNN: neighbors beyond the 3×3
  // ring (distance > 32) are out of scope by design — the standard
  // grid-kNN contract; shrinking cells trades ring misses for fan-
  // out. Two equi-shuffles + a per-customer window, no cross join
  // anywhere. Output: per-nation match counts, exact distance sums,
  // and a pair checksum.
  // ------------------------------------------------------------------
  private val knnCell = 32L

  private val geoKnnJoin: QFn = (s, dir) => {
    val c = t(s, dir, "customer").select(
      col("c_custkey").as("cid"), col("c_nationkey"),
      expr("(c_custkey * 37 + 11) % 1000").as("cx"),
      expr("(c_custkey * 73 + 29) % 1000").as("cy"))
    val sup = t(s, dir, "supplier").select(
      col("s_suppkey").as("sid"),
      expr("(s_suppkey * 53 + 17) % 1000").as("sx"),
      expr("(s_suppkey * 97 + 43) % 1000").as("sy"))
      .withColumn("cellx", expr(s"sx div $knnCell"))
      .withColumn("celly", expr(s"sy div $knnCell"))
    val cells = c
      .withColumn("dx", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("dy", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("cellx", expr(s"cx div $knnCell") + col("dx"))
      .withColumn("celly", expr(s"cy div $knnCell") + col("dy"))
    val cand = cells.join(sup, Seq("cellx", "celly"))
      .select(col("cid"), col("c_nationkey"), col("sid"),
        ((col("cx") - col("sx")) * (col("cx") - col("sx")) +
         (col("cy") - col("sy")) * (col("cy") - col("sy"))).as("d2"))
      .filter(col("d2") <= lit(knnCell * knnCell))
    val wK = Window.partitionBy("cid").orderBy(col("d2").asc,
      col("sid").asc)
    val top3 = cand.withColumn("rn", row_number().over(wK))
      .filter(col("rn") <= 3)
    top3.join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(countDistinct(col("cid")).as("n_matched_custs"),
        count(lit(1)).as("n_pairs"),
        sum(col("d2")).cast("long").as("d2_sum"),
        sum(col("cid") * col("sid")).cast("long").as("pair_checksum"))
      .orderBy("n_name")
  }
  private val geoKnnJoinSql =
    s"""WITH c AS (SELECT c_custkey AS cid, c_nationkey,
       |    (c_custkey * 37 + 11) % 1000 AS cx,
       |    (c_custkey * 73 + 29) % 1000 AS cy
       |  FROM customer),
       |s AS (SELECT s_suppkey AS sid,
       |    (s_suppkey * 53 + 17) % 1000 AS sx,
       |    (s_suppkey * 97 + 43) % 1000 AS sy
       |  FROM supplier),
       |cand AS (SELECT c.cid, c.c_nationkey, s.sid,
       |    (c.cx - s.sx) * (c.cx - s.sx)
       |      + (c.cy - s.sy) * (c.cy - s.sy) AS d2
       |  FROM c JOIN s ON s.sx // $knnCell
       |      BETWEEN c.cx // $knnCell - 1 AND c.cx // $knnCell + 1
       |    AND s.sy // $knnCell
       |      BETWEEN c.cy // $knnCell - 1 AND c.cy // $knnCell + 1
       |  WHERE (c.cx - s.sx) * (c.cx - s.sx)
       |      + (c.cy - s.sy) * (c.cy - s.sy) <= ${knnCell * knnCell}),
       |top3 AS (SELECT * FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY cid
       |    ORDER BY d2, sid) <= 3)
       |SELECT n_name, COUNT(DISTINCT cid) AS n_matched_custs,
       |  COUNT(*) AS n_pairs,
       |  CAST(SUM(d2) AS BIGINT) AS d2_sum,
       |  CAST(SUM(cid * sid) AS BIGINT) AS pair_checksum
       |FROM top3 JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // a39_jackknife — delete-one-nation jackknife for the global mean
  // order price: the g leave-one-out estimates come FREE from the
  // per-nation sufficient statistics (n_i, Σ_i) — θ̂₍ᵢ₎ =
  // (S−Σᵢ)/(N−nᵢ), no re-scan per replicate, the property that makes
  // the grouped jackknife viable at 100 TB (one aggregation pass,
  // then arithmetic on a g-row table). Each θ̂₍ᵢ₎ is ONE rounded
  // double frozen as DECIMAL(18,6); the pseudo-value variance
  // (g−1)/g·Σ(θ̂₍ᵢ₎−θ̄)² runs in exact decimal squares; the standard
  // error takes the single final sqrt.
  // ------------------------------------------------------------------
  private val a39Jackknife: QFn = (s, dir) => {
    val per = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("ni"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).as("si"))
    val tot = per.agg(sum(col("ni")).as("nt"),
      sum(col("si")).cast(DecimalType(38, 4)).as("st"),
      count(lit(1)).as("g"))
    val loo = per.crossJoin(broadcast(tot))
      .select(col("g"), col("nt"), col("st"),
        round((col("st") - col("si")).cast("double") /
          (col("nt") - col("ni")).cast("double"), 6)
          .cast(DecimalType(18, 6)).as("theta_i"))
    val bar = loo.groupBy("g", "nt", "st")
      .agg(sum(col("theta_i")).as("sth"))
      .select(col("g"), col("nt"), col("st"),
        round(col("sth").cast("double") / col("g").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("theta_bar"))
    loo.join(broadcast(bar), Seq("g", "nt", "st"))
      .select(col("g"), col("nt"), col("st"), col("theta_bar"),
        ((col("theta_i") - col("theta_bar")) *
         (col("theta_i") - col("theta_bar")))
          .cast(DecimalType(38, 12)).as("dev2"))
      .groupBy("g", "nt", "st", "theta_bar")
      .agg(sum(col("dev2")).as("ssd"))
      .select(col("g"),
        round(col("st").cast("double") / col("nt").cast("double"), 6)
          .as("theta_all_r"),
        col("theta_bar").cast("string").as("theta_bar"),
        round((col("g") - 1).cast("double") / col("g").cast("double") *
          col("ssd").cast("double"), 6).as("jack_var_r"),
        round(sqrt((col("g") - 1).cast("double") / col("g").cast("double") *
          col("ssd").cast("double")), 6).as("jack_se_r"))
  }
  private val a39JackknifeSql =
    """WITH per AS (SELECT c_nationkey, COUNT(*) AS ni,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS si
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |tot AS (SELECT SUM(ni) AS nt, CAST(SUM(si) AS DECIMAL(38,4)) AS st,
      |    COUNT(*) AS g
      |  FROM per),
      |loo AS (SELECT tot.g, tot.nt, tot.st,
      |    CAST(round(CAST(tot.st - per.si AS DOUBLE)
      |      / CAST(tot.nt - per.ni AS DOUBLE), 6) AS DECIMAL(18,6))
      |      AS theta_i
      |  FROM per CROSS JOIN tot),
      |bar AS (SELECT g, nt, st,
      |    CAST(round(CAST(SUM(theta_i) AS DOUBLE) / CAST(g AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS theta_bar
      |  FROM loo GROUP BY 1, 2, 3),
      |dev AS (SELECT loo.g, loo.nt, loo.st, bar.theta_bar,
      |    CAST((loo.theta_i - bar.theta_bar)
      |      * (loo.theta_i - bar.theta_bar) AS DECIMAL(38,12)) AS dev2
      |  FROM loo JOIN bar ON bar.g = loo.g)
      |SELECT g,
      |  round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS theta_all_r,
      |  CAST(theta_bar AS VARCHAR) AS theta_bar,
      |  round(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE)
      |    * CAST(SUM(dev2) AS DOUBLE), 6) AS jack_var_r,
      |  round(sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE)
      |    * CAST(SUM(dev2) AS DOUBLE)), 6) AS jack_se_r
      |FROM dev GROUP BY g, nt, st, theta_bar""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_zipf_fit" -> tZipfFit,
    "geo_knn_join" -> geoKnnJoin,
    "a39_jackknife" -> a39Jackknife)

  val oracleSql: Map[String, String] = Map(
    "t_zipf_fit" -> tZipfFitSql,
    "geo_knn_join" -> geoKnnJoinSql,
    "a39_jackknife" -> a39JackknifeSql)
}
