package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-fourth pack: the dictionary-encoding
  * advisor (per string column, cardinality ratios → estimated bytes
  * saved — the storage-layout recommendation a table optimizer
  * emits), the learning curve (the stump fit on growing hash
  * fractions against one fixed held-out fold — "would more data
  * help?" answered as data), and the argmax-aggregate pack
  * (max_by/min_by surfaced as first-class — the single-pass
  * greatest-per-group that replaces a window+filter).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier36Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // s31_dict_advisor — dictionary-encoding recommendations for the
  // orders/customer string columns: per column, distinct count,
  // total and average byte lengths, the dictionary-encoded estimate
  // (distinct values' bytes + a 4-byte code per row vs raw bytes),
  // and the encode/don't-encode verdict. All exact integer byte
  // arithmetic from two aggregation passes (per-column distincts
  // union'd into one result — the s12 profiling shape pointed at
  // storage planning). This is the advisor output a layout optimizer
  // acts on before a 100-TB rewrite.
  // ------------------------------------------------------------------
  private val s31DictAdvisor: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    def advise(df: DataFrame, cname: String): DataFrame = {
      val cc = col(cname)
      df.select(cc).agg(
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(cc).cast("long").as("n_distinct"),
        sum(length(cc)).cast("long").as("raw_bytes"))
        .crossJoin(df.select(cc).distinct()
          .agg(sum(length(cc)).cast("long").as("dict_value_bytes")))
        .select(lit(cname).as("column_name"), col("n_rows"),
          col("n_distinct"), col("raw_bytes"),
          (col("dict_value_bytes") + lit(4L) * col("n_rows"))
            .as("dict_bytes"),
          round(col("n_distinct").cast("double") /
            col("n_rows").cast("double"), 6).as("card_ratio_r"),
          (col("dict_value_bytes") + lit(4L) * col("n_rows") <
            col("raw_bytes")).as("encode"))
    }
    advise(o, "o_orderstatus")
      .unionByName(advise(o, "o_orderpriority"))
      .unionByName(advise(c, "c_mktsegment"))
      .unionByName(advise(c, "c_name"))
      .orderBy("column_name")
  }
  private val s31DictAdvisorSql = {
    def advise(tbl: String, cname: String): String =
      s"""SELECT '$cname' AS column_name,
         |  (SELECT COUNT(*) FROM $tbl) AS n_rows,
         |  (SELECT COUNT(DISTINCT $cname) FROM $tbl) AS n_distinct,
         |  (SELECT CAST(SUM(length($cname)) AS BIGINT) FROM $tbl)
         |    AS raw_bytes,
         |  (SELECT CAST(SUM(length($cname)) AS BIGINT)
         |    FROM (SELECT DISTINCT $cname FROM $tbl))
         |    + 4 * (SELECT COUNT(*) FROM $tbl) AS dict_bytes,
         |  round(CAST((SELECT COUNT(DISTINCT $cname) FROM $tbl)
         |      AS DOUBLE)
         |    / CAST((SELECT COUNT(*) FROM $tbl) AS DOUBLE), 6)
         |    AS card_ratio_r,
         |  (SELECT CAST(SUM(length($cname)) AS BIGINT)
         |    FROM (SELECT DISTINCT $cname FROM $tbl))
         |    + 4 * (SELECT COUNT(*) FROM $tbl)
         |    < (SELECT CAST(SUM(length($cname)) AS BIGINT) FROM $tbl)
         |    AS encode""".stripMargin
    s"""${advise("orders", "o_orderstatus")}
       |UNION ALL
       |${advise("orders", "o_orderpriority")}
       |UNION ALL
       |${advise("customer", "c_mktsegment")}
       |UNION ALL
       |${advise("customer", "c_name")}
       |ORDER BY column_name""".stripMargin
  }

  // ------------------------------------------------------------------
  // ml_learning_curve — would more data help? The month-bin stump
  // fits on nested hash fractions (25/50/75/100% of the md5 training
  // pool — NESTED so each bigger slice contains the smaller, the
  // honest learning-curve protocol) and every fit scores the SAME
  // held-out fold (hash class 0 never trains). Validation MSE
  // flattening with size = model capacity is the binding constraint,
  // not data — the decision between "collect more" and "model
  // better", measured. Each point is one bounded bin-aggregation +
  // one scoring pass.
  // ------------------------------------------------------------------
  private val mlLearningCurve: QFn = (s, dir) => {
    val rows = t(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("bin"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("y"),
        (conv(substring(md5(concat(lit("lc:"),
          col("o_orderkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 100).as("h"))
      .localCheckpoint(true)
    // h = 0..24 is the held-out fold; training pool h = 25..99,
    // nested slices by h upper bound
    def point(frac: Int, hi: Long): DataFrame = {
      val train = rows.filter(col("h") >= 25 && col("h") < hi)
      val bins = train.groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("y")).cast(DecimalType(38, 4)).as("sy"),
          sum((col("y") * col("y")).cast(DecimalType(38, 8))).as("qy"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = bins
        .withColumn("nl", sum(col("n")).over(wc))
        .withColumn("sl", sum(col("sy")).over(wc).cast(DecimalType(38, 4)))
        .withColumn("ql", sum(col("qy")).over(wc).cast(DecimalType(38, 8)))
      val tot = bins.agg(sum(col("n")).as("nt"),
        sum(col("sy")).cast(DecimalType(38, 4)).as("st"),
        sum(col("qy")).cast(DecimalType(38, 8)).as("qt"))
      val best = cum.crossJoin(broadcast(tot))
        .filter(col("nl") < col("nt"))
        .select(col("bin").as("thr"), col("nl"), col("sl"),
          (col("nt") - col("nl")).as("nr"),
          (col("st") - col("sl")).as("sr"),
          round(((col("ql").cast("double") -
            col("sl").cast("double") * col("sl").cast("double") /
              col("nl").cast("double")) +
            ((col("qt") - col("ql")).cast("double") -
              (col("st") - col("sl")).cast("double") *
              (col("st") - col("sl")).cast("double") /
                (col("nt") - col("nl")).cast("double"))) / lit(1e6), 4)
            .as("sse_m"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("sse_m").asc, col("thr").asc)))
        .filter(col("rk") === 1)
        .select(col("thr"),
          round(col("sl").cast("double") / col("nl").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("lm"),
          round(col("sr").cast("double") / col("nr").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("rm"))
      val valScored = rows.filter(col("h") < 25)
        .crossJoin(broadcast(best))
        .select((round(col("y") - when(col("bin") <= col("thr"),
          col("lm")).otherwise(col("rm")), 4).cast(DecimalType(18, 4)))
          .as("r"))
        .select((col("r") * col("r")).cast(DecimalType(38, 8)).as("r2"))
      val trainN = train.count()
      valScored.agg(sum(col("r2")).as("sva"), count(lit(1)).as("nva"))
        .select(lit(frac).as("train_pct"), lit(trainN).as("n_train"),
          round(col("sva").cast("double") / col("nva").cast("double") /
            lit(1e6), 6).as("val_mse_m_r"))
    }
    point(25, 25 + 19).unionByName(point(50, 25 + 38))
      .unionByName(point(75, 25 + 56)).unionByName(point(100, 100))
      .orderBy("train_pct")
  }
  private val mlLearningCurveSql = {
    def point(frac: Int, hi: Long): String =
      s"""bins_$frac AS (SELECT bin, COUNT(*) AS n,
         |    CAST(SUM(y) AS DECIMAL(38,4)) AS sy,
         |    CAST(SUM(CAST(y AS DECIMAL(28,4)) * y) AS DECIMAL(38,8))
         |      AS qy
         |  FROM rows0 WHERE h >= 25 AND h < $hi GROUP BY 1),
         |cum_$frac AS (SELECT bin, SUM(n) OVER wb AS nl,
         |    CAST(SUM(sy) OVER wb AS DECIMAL(38,4)) AS sl,
         |    CAST(SUM(qy) OVER wb AS DECIMAL(38,8)) AS ql
         |  FROM bins_$frac
         |  WINDOW wb AS (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot_$frac AS (SELECT SUM(n) AS nt,
         |    CAST(SUM(sy) AS DECIMAL(38,4)) AS st,
         |    CAST(SUM(qy) AS DECIMAL(38,8)) AS qt FROM bins_$frac),
         |best_$frac AS (SELECT thr,
         |    CAST(round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS lm,
         |    CAST(round(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS rm
         |  FROM (SELECT bin AS thr, nl, sl, nt - nl AS nr,
         |      st - sl AS sr,
         |      round(((CAST(ql AS DOUBLE)
         |          - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
         |            / CAST(nl AS DOUBLE))
         |        + (CAST(qt - ql AS DOUBLE)
         |          - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
         |            / CAST(nt - nl AS DOUBLE))) / 1e6, 4) AS sse_m
         |    FROM cum_$frac CROSS JOIN tot_$frac WHERE nl < nt)
         |  QUALIFY row_number() OVER (ORDER BY sse_m, thr) = 1),
         |res_$frac AS (SELECT $frac AS train_pct,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM rows0
         |      WHERE h >= 25 AND h < $hi) AS n_train,
         |    round(CAST(SUM(CAST(CAST(round(rows0.y
         |        - CASE WHEN rows0.bin <= b.thr THEN b.lm ELSE b.rm END,
         |        4) AS DECIMAL(18,4)) AS DECIMAL(28,4))
         |      * CAST(round(rows0.y
         |        - CASE WHEN rows0.bin <= b.thr THEN b.lm ELSE b.rm END,
         |        4) AS DECIMAL(18,4))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS val_mse_m_r
         |  FROM rows0 CROSS JOIN best_$frac b WHERE rows0.h < 25)"""
        .stripMargin
    s"""WITH rows0 AS (SELECT
       |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
       |      AS bin,
       |    CAST(o_totalprice AS DECIMAL(18,4)) AS y,
       |    CAST(('0x' || substring(md5('lc:'
       |      || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100
       |      AS h
       |  FROM orders),
       |${point(25, 25 + 19)},
       |${point(50, 25 + 38)},
       |${point(75, 25 + 56)},
       |${point(100, 100)}
       |SELECT * FROM res_25 UNION ALL SELECT * FROM res_50
       |UNION ALL SELECT * FROM res_75 UNION ALL SELECT * FROM res_100
       |ORDER BY train_pct""".stripMargin
  }

  // ------------------------------------------------------------------
  // f_argmax_pack — the argmax-aggregate surface: max_by / min_by
  // answer "WHICH value attains the extreme" in ONE hash aggregate
  // (no window, no sort, no self-join — the pattern that replaces
  // row_number()=1 for plain greatest-per-group). Per nation: the
  // highest-value order's key and priority (max_by with the orderkey
  // tie-break packed into the ordering struct so both engines agree
  // on ties), the earliest order's key (min_by on date, same
  // discipline), all validated against exact max/min columns riding
  // alongside.
  // ------------------------------------------------------------------
  private val fArgmaxPack: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("tp"),
        col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
    // ties broken toward the SMALLER orderkey, packed into ONE BIGINT
    // ordering key both engines share: price (scale-4 int, ≤6e9) ×
    // 1e7 − orderkey (≤1e7 at these SFs; wider keys go DECIMAL)
    val packed = o
      .withColumn("kmax", expr(
        "cast(tp * 10000 as bigint) * 10000000L - o_orderkey"))
      .withColumn("kmin", expr(
        "datediff(d, date'1970-01-01') * 100000000L + o_orderkey"))
    packed.groupBy("n_name")
      .agg(
        expr("max_by(o_orderkey, kmax)").as("top_order_key"),
        expr("max_by(o_orderpriority, kmax)").as("top_order_priority"),
        max(col("tp")).cast("string").as("top_price"),
        expr("min_by(o_orderkey, kmin)").as("first_order_key"),
        min(col("d")).cast("string").as("first_date"))
      .orderBy("n_name")
  }
  private val fArgmaxPackSql =
    """WITH o AS (SELECT n_name, o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS tp,
      |    o_orderpriority, CAST(o_orderdate AS DATE) AS d
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |p AS (SELECT o.*,
      |    CAST(tp * 10000 AS BIGINT) * 10000000 - o_orderkey AS kmax,
      |    date_diff('day', DATE '1970-01-01', d) * 100000000
      |      + o_orderkey AS kmin
      |  FROM o)
      |SELECT n_name,
      |  arg_max(o_orderkey, kmax) AS top_order_key,
      |  arg_max(o_orderpriority, kmax) AS top_order_priority,
      |  CAST(MAX(tp) AS VARCHAR) AS top_price,
      |  arg_min(o_orderkey, kmin) AS first_order_key,
      |  CAST(MIN(d) AS VARCHAR) AS first_date
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "s31_dict_advisor" -> s31DictAdvisor,
    "ml_learning_curve" -> mlLearningCurve,
    "f_argmax_pack" -> fArgmaxPack)

  val oracleSql: Map[String, String] = Map(
    "s31_dict_advisor" -> s31DictAdvisorSql,
    "ml_learning_curve" -> mlLearningCurveSql,
    "f_argmax_pack" -> fArgmaxPackSql)
}
