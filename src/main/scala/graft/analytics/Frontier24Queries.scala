package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twelfth pack: length-bucketed batch packing
  * (the dynamic-batching efficiency analysis every serving/training
  * stack runs — padding waste under naive vs length-bucketed
  * batching), Shewhart individuals control chart (SPC limits on the
  * daily order flow — the complement of q29's CUSUM, which detects
  * drifts; Shewhart catches spikes), and degree assortativity (the
  * Newman 2002 mixing coefficient: do well-connected parts co-occur
  * with each other?).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier24Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // p_length_batching — padding-waste accounting for batch size 8:
  // under NAIVE batching (doc_id order) each batch pads every doc to
  // the batch max token length; under LENGTH-BUCKETED batching (docs
  // ranked by (token_len, doc_id) — the sort the bucketing shuffle
  // realizes) batch-mates have near-equal lengths and the padding
  // collapses. Both assignments are rank÷8 expressions over two-phase
  // contiguous numberings (etl/SurrogateKeys.scalable: range partition
  // + zipWithIndex — no global window, no single-partition funnel);
  // per-batch stats are one groupBy each; the final row quantifies the
  // saving. The padding saved is the serving-cost argument for length
  // bucketing, stated as data.
  // ------------------------------------------------------------------
  private val pLengthBatching: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TF.wsTokenCount(col("text")).cast("long")
        .as("tok"))
      .localCheckpoint(true)
    def waste(assigned: DataFrame): DataFrame = assigned
      .groupBy("batch")
      .agg(count(lit(1)).as("n"), sum(col("tok")).as("toks"),
        max(col("tok")).as("mx"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("toks")).cast("long").as("real_tokens"),
        sum(col("mx") * col("n")).cast("long").as("padded_tokens"))
    def batched(order: Seq[org.apache.spark.sql.Column]): DataFrame =
      graft.etl.SurrogateKeys.scalable(docs, "__rn", order)
        .withColumn("batch", ((col("__rn") - 1) / 8).cast("long"))
    val naive = waste(batched(Seq(col("doc_id"))))
    val bucketed = waste(batched(Seq(col("tok").asc, col("doc_id").asc)))
    naive.select(lit("naive").as("strategy"), col("n_batches"),
        col("real_tokens"), col("padded_tokens"))
      .unionByName(bucketed.select(lit("bucketed").as("strategy"),
        col("n_batches"), col("real_tokens"), col("padded_tokens")))
      .select(col("strategy"), col("n_batches"), col("real_tokens"),
        col("padded_tokens"),
        round((col("padded_tokens") - col("real_tokens")).cast("double") /
          col("padded_tokens").cast("double"), 6).as("waste_r"))
      .orderBy("strategy")
  }
  private val pLengthBatchingSql = {
    val tokCnt = TF.wsTokenCountSql("text")
    s"""WITH docs AS (SELECT doc_id, CAST($tokCnt AS BIGINT) AS tok
       |  FROM documents),
       |na AS (SELECT (row_number() OVER (ORDER BY doc_id) - 1) // 8
       |    AS batch, tok FROM docs),
       |bu AS (SELECT (row_number() OVER (ORDER BY tok, doc_id) - 1) // 8
       |    AS batch, tok FROM docs),
       |nw AS (SELECT COUNT(*) AS n_batches,
       |    CAST(SUM(toks) AS BIGINT) AS real_tokens,
       |    CAST(SUM(mx * n) AS BIGINT) AS padded_tokens
       |  FROM (SELECT batch, COUNT(*) AS n, SUM(tok) AS toks,
       |      MAX(tok) AS mx FROM na GROUP BY 1)),
       |bw AS (SELECT COUNT(*) AS n_batches,
       |    CAST(SUM(toks) AS BIGINT) AS real_tokens,
       |    CAST(SUM(mx * n) AS BIGINT) AS padded_tokens
       |  FROM (SELECT batch, COUNT(*) AS n, SUM(tok) AS toks,
       |      MAX(tok) AS mx FROM bu GROUP BY 1))
       |SELECT strategy, n_batches, real_tokens, padded_tokens,
       |  round(CAST(padded_tokens - real_tokens AS DOUBLE)
       |    / CAST(padded_tokens AS DOUBLE), 6) AS waste_r
       |FROM (SELECT 'naive' AS strategy, * FROM nw
       |      UNION ALL SELECT 'bucketed', * FROM bw)
       |ORDER BY strategy""".stripMargin
  }

  // ------------------------------------------------------------------
  // a48_control_chart — Shewhart individuals chart on the daily
  // order count: center line = mean daily count, sigma estimated
  // from the mean absolute successive difference (the moving-range
  // method, MR̄/d₂ with d₂ = 1.128 for n=2 — the standard individuals-
  // chart estimator, robust to the series' own trend), limits at
  // ±3σ. Flags every out-of-control day. The moving range is one
  // lag() over the date-ordered daily aggregate (data-scale-
  // invariant table); everything else is exact integer sums with ONE
  // rounded double per emitted limit. Output: per out-of-control day
  // a row, plus the 'LIMITS' summary row.
  // ------------------------------------------------------------------
  private val a48ControlChart: QFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val mr = daily
      .withColumn("prev", lag(col("n"), 1).over(Window.orderBy("d")))
      .filter(col("prev").isNotNull)
      .agg(count(lit(1)).as("nmr"),
        sum(abs(col("n") - col("prev"))).as("smr"))
    val st = daily.agg(count(lit(1)).as("nd"), sum(col("n")).as("sn"))
    val limits = st.crossJoin(mr)
      .select(
        round(col("sn").cast("double") / col("nd").cast("double"), 6)
          .as("cl"),
        round((col("smr").cast("double") / col("nmr").cast("double")) /
          1.128, 6).as("sigma"))
      .select(col("cl"), col("sigma"),
        round(col("cl") + lit(3.0) * col("sigma"), 6).as("ucl"),
        round(col("cl") - lit(3.0) * col("sigma"), 6).as("lcl"))
    val ooc = daily.crossJoin(broadcast(limits))
      .filter(col("n") > col("ucl") || col("n") < col("lcl"))
      .select(col("d").cast("string").as("day"),
        col("n").cast("long").as("value"),
        lit("out_of_control").as("kind"))
    val sumRow = limits.crossJoin(ooc.agg(count(lit(1)).as("n_ooc")))
      .select(lit("LIMITS").as("day"), col("n_ooc").as("value"),
        concat(lit("cl="), col("cl").cast("string"), lit(" ucl="),
          col("ucl").cast("string"), lit(" lcl="),
          col("lcl").cast("string")).as("kind"))
    ooc.unionByName(sumRow).orderBy("day")
  }
  private val a48ControlChartSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1),
      |mr AS (SELECT COUNT(*) AS nmr, SUM(ABS(n - prev)) AS smr
      |  FROM (SELECT n, lag(n) OVER (ORDER BY d) AS prev FROM daily)
      |  WHERE prev IS NOT NULL),
      |st AS (SELECT COUNT(*) AS nd, SUM(n) AS sn FROM daily),
      |lim0 AS (SELECT
      |    round(CAST(st.sn AS DOUBLE) / CAST(st.nd AS DOUBLE), 6) AS cl,
      |    round((CAST(mr.smr AS DOUBLE) / CAST(mr.nmr AS DOUBLE))
      |      / 1.128, 6) AS sigma
      |  FROM st CROSS JOIN mr),
      |lim AS (SELECT cl, sigma,
      |    round(cl + 3.0 * sigma, 6) AS ucl,
      |    round(cl - 3.0 * sigma, 6) AS lcl
      |  FROM lim0),
      |ooc AS (SELECT CAST(d AS VARCHAR) AS day,
      |    CAST(n AS BIGINT) AS value, 'out_of_control' AS kind
      |  FROM daily CROSS JOIN lim
      |  WHERE n > ucl OR n < lcl)
      |SELECT * FROM ooc
      |UNION ALL
      |SELECT 'LIMITS',
      |  (SELECT COUNT(*) FROM ooc),
      |  'cl=' || CAST(cl AS VARCHAR) || ' ucl=' || CAST(ucl AS VARCHAR)
      |    || ' lcl=' || CAST(lcl AS VARCHAR)
      |FROM lim
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // g_assortativity — Newman degree assortativity of the co-purchase
  // graph (part pairs sharing ≥2 orders): the Pearson correlation of
  // endpoint degrees over the DIRECTED edge list (both orientations,
  // the standard undirected convention). Degrees are exact counts;
  // the correlation runs on the a14 moment idiom (exact decimal
  // Σx, Σy, Σxx, Σyy, Σxy over the edge list → double once → one
  // fixed expression tree). Positive r = hubs buy with hubs
  // (assortative); negative = hub-leaf structure. One groupBy for
  // degrees + one broadcast-joined moment pass over the edges.
  // ------------------------------------------------------------------
  private val gAssortativity: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2)
      .select(col("pa"), col("pb"))
      .localCheckpoint(true)
    val e = e0.unionAll(e0.select(col("pb").as("pa"), col("pa").as("pb")))
    val deg = e.groupBy(col("pa").as("v")).agg(count(lit(1)).as("deg"))
    val xy = e
      .join(deg.select(col("v").as("pa"), col("deg").as("dx")), "pa")
      .join(deg.select(col("v").as("pb"), col("deg").as("dy")), "pb")
      .select(col("dx").cast(DecimalType(18, 0)).as("x"),
        col("dy").cast(DecimalType(18, 0)).as("y"))
    val m = xy.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx0"),
      sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy0"),
      sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy0"))
    val n = col("n")
    val sx = col("sx0").cast("double"); val sy = col("sy0").cast("double")
    val sxx = col("sxx0").cast("double"); val syy = col("syy0").cast("double")
    val sxy = col("sxy0").cast("double")
    m.select(n.as("n_directed_edges"),
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        .as("assortativity_r"))
  }
  private val gAssortativitySql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM op a JOIN op b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa, pb FROM e0 UNION ALL SELECT pb, pa FROM e0),
      |deg AS (SELECT pa AS v, COUNT(*) AS deg FROM e GROUP BY 1),
      |xy AS (SELECT CAST(dx.deg AS DECIMAL(18,0)) AS x,
      |    CAST(dy.deg AS DECIMAL(18,0)) AS y
      |  FROM e JOIN deg dx ON dx.v = e.pa JOIN deg dy ON dy.v = e.pb),
      |m AS (SELECT COUNT(*) AS n, SUM(x) AS sx0, SUM(y) AS sy0,
      |    SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx0,
      |    SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy0,
      |    SUM(CAST(y * y AS DECIMAL(38,0))) AS syy0
      |  FROM xy),
      |d AS (SELECT n,
      |    CAST(CAST(sx0 AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sy0 AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sxx0 AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sxy0 AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(syy0 AS VARCHAR) AS DOUBLE) AS syy
      |  FROM m)
      |SELECT n AS n_directed_edges,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
      |    AS assortativity_r
      |FROM d""".stripMargin

  val queries: Map[String, QFn] = Map(
    "p_length_batching" -> pLengthBatching,
    "a48_control_chart" -> a48ControlChart,
    "g_assortativity" -> gAssortativity)

  val oracleSql: Map[String, String] = Map(
    "p_length_batching" -> pLengthBatchingSql,
    "a48_control_chart" -> a48ControlChartSql,
    "g_assortativity" -> gAssortativitySql)
}
