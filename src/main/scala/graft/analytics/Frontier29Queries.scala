package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, seventeenth pack: the accumulating-snapshot
  * fact table (Kimball's fourth fact type — one row per process
  * instance whose milestone columns fill in as the order moves;
  * completes the transaction/periodic/factless coverage), BPE merge
  * rounds (the byte-pair-encoding inner loop every tokenizer
  * training runs — vocabulary-weighted pair counting, argmax merge,
  * re-count), and classical ratio-to-moving-average seasonal
  * indices (the multiplicative seasonality table a forecaster
  * divides out before trending).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier29Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // i25_accumulating_snapshot — the order-fulfillment accumulating
  // snapshot: each order is one process instance whose milestones
  // (placed → first ship → final ship) come from the order header
  // and a line-item rollup; the lag columns (days to first/final
  // ship) are the process-efficiency measures the pattern exists
  // for. Reported at the month × status grain (bounded) with exact
  // counts and decimal-frozen mean lags. The milestone rollup is ONE
  // groupBy on the order key — at scale this fact refreshes by
  // re-aggregating only orders whose lines changed (the watermark
  // framework the etl package already provides).
  // ------------------------------------------------------------------
  private val i25AccumulatingSnapshot: QFn = (s, dir) => {
    val ship = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"),
        max(to_date(col("l_shipdate"))).as("final_ship"),
        count(lit(1)).as("n_lines"))
    val fact = t(s, dir, "orders")
      .join(ship, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mon"),
        col("o_orderstatus").as("status"),
        col("n_lines"),
        datediff(col("first_ship"), to_date(col("o_orderdate")))
          .cast("long").as("to_first"),
        datediff(col("final_ship"), to_date(col("o_orderdate")))
          .cast("long").as("to_final"))
    fact.groupBy("mon", "status")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("n_lines").isNull, 1L).otherwise(0L))
          .cast("long").as("n_unshipped"),
        coalesce(sum(col("to_first")), lit(0L)).cast("long")
          .as("sum_to_first"),
        coalesce(sum(col("to_final")), lit(0L)).cast("long")
          .as("sum_to_final"),
        count(col("to_first")).as("n_shipped"))
      .select(col("mon"), col("status"), col("n_orders"),
        col("n_unshipped"),
        when(col("n_shipped") === 0, lit(0.0))
          .otherwise(round(col("sum_to_first").cast("double") /
            col("n_shipped").cast("double"), 6))
          .as("mean_days_to_first_r"),
        when(col("n_shipped") === 0, lit(0.0))
          .otherwise(round(col("sum_to_final").cast("double") /
            col("n_shipped").cast("double"), 6))
          .as("mean_days_to_final_r"))
      .orderBy("mon", "status")
  }
  private val i25AccumulatingSnapshotSql =
    """WITH ship AS (SELECT l_orderkey,
      |    MIN(CAST(l_shipdate AS DATE)) AS first_ship,
      |    MAX(CAST(l_shipdate AS DATE)) AS final_ship,
      |    COUNT(*) AS n_lines
      |  FROM lineitem GROUP BY 1),
      |fact AS (SELECT
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon,
      |    o_orderstatus AS status, ship.n_lines,
      |    date_diff('day', CAST(o_orderdate AS DATE), ship.first_ship)
      |      AS to_first,
      |    date_diff('day', CAST(o_orderdate AS DATE), ship.final_ship)
      |      AS to_final
      |  FROM orders LEFT JOIN ship ON l_orderkey = o_orderkey)
      |SELECT mon, status, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_unshipped,
      |  CASE WHEN COUNT(to_first) = 0 THEN 0.0
      |    ELSE round(CAST(SUM(to_first) AS DOUBLE)
      |      / CAST(COUNT(to_first) AS DOUBLE), 6) END
      |    AS mean_days_to_first_r,
      |  CASE WHEN COUNT(to_final) = 0 THEN 0.0
      |    ELSE round(CAST(SUM(to_final) AS DOUBLE)
      |      / CAST(COUNT(to_final) AS DOUBLE), 6) END
      |    AS mean_days_to_final_r
      |FROM fact GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // t_bpe_merges — three byte-pair-encoding merge rounds on the
  // corpus vocabulary: words reduce to (distinct word, frequency)
  // first (the standard BPE-on-vocab formulation — Heaps' law keeps
  // the vocab sublinear), each word spells as space-separated
  // symbols, adjacent symbol pairs count weighted by word frequency,
  // the argmax pair (ties: lexicographic — both engines agree)
  // merges via plain all-occurrence replace, and the next round
  // re-counts. Emits (round, merged pair, its count) — the literal
  // merge table a tokenizer trainer writes. Pair counting shuffles
  // on the symbol-pair key; the merge itself is a projection. The
  // space-joined replace can in principle cross a symbol boundary
  // once merged symbols share suffixes ("a ab" matching inside
  // "aa ab"); the spec proves 3 rounds on this corpus match a
  // proper boundary-aware BPE trainer exactly — deeper merge tables
  // would switch the projection to a split-then-scan merge.
  // ------------------------------------------------------------------
  private val tBpeMerges: QFn = (s, dir) => {
    val vocab = t(s, dir, "documents")
      .select(explode(split(TF.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      // spell as space-separated characters; keep w as the stable
      // row identity (merged syms could in principle collide)
      .select(col("w"), array_join(split(col("w"), ""), " ").as("sym"),
        col("f"))
      .localCheckpoint(true)
    def topPair(v: DataFrame): DataFrame = {
      val pairs = v
        .select(col("w"), col("f"), posexplode(split(col("sym"), " "))
          .as(Seq("i", "a")))
        .withColumn("b", lead(col("a"), 1).over(
          Window.partitionBy("w").orderBy("i")))
        .filter(col("b").isNotNull)
      // the lead() partitions on the distinct-word identity, so every
      // word type contributes its own pair stream, weighted by f
      pairs.groupBy("a", "b")
        .agg(sum(col("f")).as("cnt"))
        .withColumn("rk", row_number().over(Window.orderBy(
          col("cnt").desc, col("a").asc, col("b").asc)))
        .filter(col("rk") === 1)
        .select(col("a"), col("b"), col("cnt").cast("long").as("cnt"))
    }
    def mergeRound(v: DataFrame, top: DataFrame): DataFrame =
      v.crossJoin(broadcast(top))
        .select(col("w"),
          expr("replace(sym, a || ' ' || b, a || b)").as("sym"),
          col("f"))
    val t1 = topPair(vocab).localCheckpoint(true)
    val v2 = mergeRound(vocab, t1).localCheckpoint(true)
    val t2 = topPair(v2).localCheckpoint(true)
    val v3 = mergeRound(v2, t2).localCheckpoint(true)
    val t3 = topPair(v3)
    t1.select(lit(1).as("round"), concat(col("a"), lit("+"), col("b"))
        .as("pair"), col("cnt"))
      .unionByName(t2.select(lit(2).as("round"),
        concat(col("a"), lit("+"), col("b")).as("pair"), col("cnt")))
      .unionByName(t3.select(lit(3).as("round"),
        concat(col("a"), lit("+"), col("b")).as("pair"), col("cnt")))
      .orderBy("round")
  }
  private val tBpeMergesSql = {
    val norm = TF.normTextSql("text")
    def top(v: String, n: Int): String =
      s"""p$n AS (SELECT a, b, SUM(f) AS cnt FROM (
         |  SELECT f, s AS a,
         |      lead(s) OVER (PARTITION BY w ORDER BY i) AS b
         |  FROM (SELECT w, f, unnest(string_split(sym, ' ')) AS s,
         |      generate_subscripts(string_split(sym, ' '), 1) AS i
         |    FROM $v))
         |  WHERE b IS NOT NULL GROUP BY 1, 2),
         |t$n AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p$n
         |  QUALIFY row_number() OVER (ORDER BY cnt DESC, a, b) = 1)"""
        .stripMargin
    s"""WITH w0 AS (SELECT unnest(string_split($norm, ' ')) AS w
       |  FROM documents),
       |vocab0 AS (SELECT w, COUNT(*) AS f FROM w0
       |  WHERE length(w) > 0 GROUP BY 1),
       |v1 AS (SELECT w,
       |    array_to_string(string_split_regex(w, ''), ' ') AS sym, f
       |  FROM vocab0),
       |${top("v1", 1)},
       |v2 AS (SELECT v1.w, replace(v1.sym, t1.a || ' ' || t1.b,
       |    t1.a || t1.b) AS sym, v1.f
       |  FROM v1 CROSS JOIN t1),
       |${top("v2", 2)},
       |v3 AS (SELECT v2.w, replace(v2.sym, t2.a || ' ' || t2.b,
       |    t2.a || t2.b) AS sym, v2.f
       |  FROM v2 CROSS JOIN t2),
       |${top("v3", 3)}
       |SELECT 1 AS round, a || '+' || b AS pair, cnt FROM t1
       |UNION ALL SELECT 2, a || '+' || b, cnt FROM t2
       |UNION ALL SELECT 3, a || '+' || b, cnt FROM t3
       |ORDER BY round""".stripMargin
  }

  // ------------------------------------------------------------------
  // w32_seasonal_indices — classical multiplicative seasonal indices
  // for monthly revenue: each month's ratio to its CENTERED 12-month
  // moving average (the 2×12 MA — halves on the end months, the
  // textbook centering), averaged per calendar month and normalized
  // so the twelve indices mean to 1. Ratios and averages are ONE
  // rounded double each frozen as DECIMAL; the series is the
  // data-scale-invariant monthly aggregate, and the centered MA is
  // a 13-row window frame on it.
  // ------------------------------------------------------------------
  private val w32SeasonalIndices: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mon"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
    // calendar-bounded series (one row per month of data — dozens of
    // rows at ANY data scale), so the unpartitioned frame is safe
    val w = Window.orderBy("mon").rowsBetween(-6, 6)
    // 2x12 centered MA: mean of the 13-window with half-weight ends =
    // (sum(13) - (first+last)/2) / 12; needs a full 13-month frame
    val ma = m
      .withColumn("s13", sum(col("rev")).over(w))
      .withColumn("n13", count(lit(1)).over(w))
      .withColumn("lo", first(col("rev")).over(w))
      .withColumn("hi", last(col("rev")).over(w))
      .filter(col("n13") === 13)
      .select(col("mon"), col("rev"),
        round((col("s13") - (col("lo") + col("hi")) / 2).cast("double")
          / 12.0, 6).cast(DecimalType(18, 6)).as("cma"))
    val ratios = ma.select((col("mon") % 12).as("cal_mon"),
      round(col("rev").cast("double") / col("cma").cast("double"), 6)
        .cast(DecimalType(18, 6)).as("ratio"))
    val per = ratios.groupBy("cal_mon")
      .agg(count(lit(1)).as("n_years"),
        round(sum(col("ratio")).cast("double") / count(lit(1)), 6)
          .cast(DecimalType(18, 6)).as("raw_idx"))
    val tot = per.agg(sum(col("raw_idx")).as("si"),
      count(lit(1)).as("k"))
    per.crossJoin(broadcast(tot))
      .select(col("cal_mon"), col("n_years"),
        round(col("raw_idx").cast("double") * col("k").cast("double") /
          col("si").cast("double"), 6).as("seasonal_index_r"))
      .orderBy("cal_mon")
  }
  private val w32SeasonalIndicesSql =
    """WITH m AS (SELECT
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY 1),
      |ma AS (SELECT mon, rev,
      |    CAST(round(CAST(s13 - (lo + hi) / 2 AS DOUBLE) / 12.0, 6)
      |      AS DECIMAL(18,6)) AS cma
      |  FROM (SELECT mon, rev,
      |      SUM(rev) OVER wf AS s13, COUNT(*) OVER wf AS n13,
      |      first_value(rev) OVER wf AS lo,
      |      last_value(rev) OVER wf AS hi
      |    FROM m
      |    WINDOW wf AS (ORDER BY mon
      |      ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING))
      |  WHERE n13 = 13),
      |ratios AS (SELECT mon % 12 AS cal_mon,
      |    CAST(round(CAST(rev AS DOUBLE) / CAST(cma AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS ratio
      |  FROM ma),
      |per AS (SELECT cal_mon, COUNT(*) AS n_years,
      |    CAST(round(CAST(SUM(ratio) AS DOUBLE) / COUNT(*), 6)
      |      AS DECIMAL(18,6)) AS raw_idx
      |  FROM ratios GROUP BY 1),
      |tot AS (SELECT SUM(raw_idx) AS si, COUNT(*) AS k FROM per)
      |SELECT cal_mon, n_years,
      |  round(CAST(raw_idx AS DOUBLE) * CAST(k AS DOUBLE)
      |    / CAST(si AS DOUBLE), 6) AS seasonal_index_r
      |FROM per CROSS JOIN tot
      |ORDER BY cal_mon""".stripMargin

  val queries: Map[String, QFn] = Map(
    "i25_accumulating_snapshot" -> i25AccumulatingSnapshot,
    "t_bpe_merges" -> tBpeMerges,
    "w32_seasonal_indices" -> w32SeasonalIndices)

  val oracleSql: Map[String, String] = Map(
    "i25_accumulating_snapshot" -> i25AccumulatingSnapshotSql,
    "t_bpe_merges" -> tBpeMergesSql,
    "w32_seasonal_indices" -> w32SeasonalIndicesSql)
}
