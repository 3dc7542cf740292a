package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 fourteenth-session widening: malformed-CSV quarantine (the
  * dead-letter ingest path for the file format the reference actually
  * loads), model calibration diagnostics (reliability bins + expected
  * calibration error over the in-engine logistic model), and customer
  * value-segment migration (the period-over-period movement matrix
  * behind every retention deck).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs, total
  * ORDER BYs.
  */
object Frontier10Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // s22_csv_quarantine — malformed-record quarantine for CSV ingest
  // (the reference's own bulk-load format, proc_load_bronze.sql's
  // BULK INSERT path): a staged feed where every 17th row carries an
  // unparseable key is read back PERMISSIVE with a _corrupt_record
  // column, so bad lines become quarantine rows instead of aborting
  // the load (FAILFAST would kill a 100-TB bulk load for one bad
  // byte — the s19 JSON pattern, completed for CSV). Clean rows
  // aggregate by order status in exact DECIMAL; the corrupt bucket
  // surfaces as a NULL status group. The oracle derives the same
  // split directly from the source table.
  // ------------------------------------------------------------------
  private val s22CsvQuarantine: QFn = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csvq").toString
    t(s, dir, "orders")
      .select(when(col("o_orderkey") % 17 === 0,
        concat_ws(",", lit("XX"), lit("CORRUPT"), lit("notanumber")))
        .otherwise(concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast(DecimalType(12, 2)))).as("value"))
      .write.mode("overwrite").text(tmp)
    val parsed = s.read
      .schema("o_orderkey LONG, o_orderstatus STRING, " +
        "o_totalprice DECIMAL(12,2), _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(tmp)
    parsed
      .select(when(col("_corrupt_record").isNotNull, lit(null))
          .otherwise(col("o_orderstatus")).as("status"),
        col("o_totalprice"), col("_corrupt_record"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("o_totalprice")),
          lit(0).cast(DecimalType(12, 2))).cast("string").cast("double")
          .as("total_price_d"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"))
      .orderBy(asc_nulls_first("status"))
  }
  private val s22CsvQuarantineSql =
    """SELECT CASE WHEN o_orderkey % 17 = 0 THEN NULL
      |    ELSE o_orderstatus END AS status,
      |  COUNT(*) AS n_rows,
      |  CAST(CAST(SUM(CASE WHEN o_orderkey % 17 = 0
      |      THEN CAST(0 AS DECIMAL(12,2))
      |      ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR)
      |    AS DOUBLE) AS total_price_d,
      |  CAST(SUM(CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_corrupt
      |FROM orders GROUP BY 1 ORDER BY status NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------
  // ml_calibration_bins — reliability diagram for the in-engine
  // logistic model (graft.ml.LogReg, the ml_logreg_newton trainer):
  // predictions bucket into 10 probability bins; each bin reports its
  // exact count, mean predicted probability (exact decimal sum ÷
  // count) and observed positive rate — plus each bin's contribution
  // to the expected calibration error (|obs − pred|·n/N, the ECE
  // summand). A model whose bins sit on the diagonal is calibrated;
  // the drift is what a production scoring pipeline alerts on. One
  // extra data pass after training; the bin table is 10 rows.
  // ------------------------------------------------------------------
  private val mlCalibrationBins: QFn = (s, dir) => {
    val d = t(s, dir, "orders").select(
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("y"),
      round(log(col("o_totalprice")), 6).cast(DecimalType(9, 6)).as("x"))
      .localCheckpoint(true)
    val (b0, b1) = graft.ml.LogReg.fit(d, iters = 2)
    val p = graft.ml.LogReg.sigmoid(b0, b1, col("x"))
    val binned = d.select(col("y"), p.as("p"))
      .withColumn("bin", least(floor(col("p").cast("double") * 10)
        .cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum(col("y")).as("npos"))
    val tot = binned.agg(sum(col("n")).as("nt"))
    binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(col("sp").cast("double") / col("n").cast("double"), 6)
          .as("mean_p_r"),
        round(col("npos").cast("double") / col("n").cast("double"), 6)
          .as("obs_rate_r"),
        round(abs(col("npos").cast("double") / col("n").cast("double") -
          col("sp").cast("double") / col("n").cast("double")) *
          col("n").cast("double") / col("nt").cast("double"), 6)
          .as("ece_part_r"))
      .orderBy("bin")
  }
  private val mlCalibrationBinsSql =
    s"""WITH d AS (SELECT
       |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END AS y,
       |    CAST(round(ln(o_totalprice), 6) AS DECIMAL(9,6)) AS x
       |  FROM orders),
       |${graft.ml.LogReg.sqlSteps(2)},
       |fp AS (SELECT d.y,
       |    CAST(round(1.0 / (1.0 + exp(-CAST(CAST(bb.b0 + bb.b1 * d.x
       |      AS VARCHAR) AS DOUBLE))), 6) AS DECIMAL(8,6)) AS p
       |  FROM d CROSS JOIN bb),
       |binned AS (SELECT
       |    least(CAST(floor(CAST(CAST(p AS VARCHAR) AS DOUBLE) * 10)
       |      AS BIGINT), 9) AS bin,
       |    COUNT(*) AS n, SUM(p) AS sp, SUM(y) AS npos
       |  FROM fp GROUP BY 1),
       |tot AS (SELECT SUM(n) AS nt FROM binned)
       |SELECT bin, CAST(n AS BIGINT) AS n,
       |  round(CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS mean_p_r,
       |  round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_rate_r,
       |  round(abs(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
       |      - CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
       |    * CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS ece_part_r
       |FROM binned CROSS JOIN tot ORDER BY bin""".stripMargin

  // ------------------------------------------------------------------
  // q33_segment_migration — customer value-segment migration between
  // two halves of the order history (≤1997 vs ≥1998): per-period
  // spend terciles (thresholds from `percentile` ≡ `quantile_cont`,
  // parity-pinned; cut points rounded once) classify each customer
  // low/mid/high, then a full-outer join builds the 4×4 movement
  // matrix including 'none' rows for churned/new customers. Two
  // customer-keyed groupBys + two broadcast threshold rows — nothing
  // shuffles on more than the customer key.
  // ------------------------------------------------------------------
  private val q33SegmentMigration: QFn = (s, dir) => {
    def spend(pred: org.apache.spark.sql.Column): DataFrame =
      t(s, dir, "orders").filter(pred)
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).as("sp"))
        .select(col("o_custkey"),
          col("sp").cast("string").cast("double").as("sp_d"))
    def seg(df: DataFrame, label: String): DataFrame = {
      val th = df.agg(
        round(expr("percentile(sp_d, 0.333333)"), 6).as("t1"),
        round(expr("percentile(sp_d, 0.666667)"), 6).as("t2"))
      df.crossJoin(broadcast(th))
        .select(col("o_custkey"),
          when(col("sp_d") <= col("t1"), "low")
            .when(col("sp_d") <= col("t2"), "mid")
            .otherwise("high").as(label))
    }
    val s1 = seg(spend(year(col("o_orderdate")) <= 1997), "seg1")
    val s2 = seg(spend(year(col("o_orderdate")) >= 1998), "seg2")
    s1.join(s2, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("seg1"), lit("none")).as("seg_before"),
        coalesce(col("seg2"), lit("none")).as("seg_after"))
      .groupBy("seg_before", "seg_after")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("seg_before", "seg_after")
  }
  private val q33SegmentMigrationSql = {
    def half(cmp: String) =
      s"""SELECT o_custkey,
         |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
         |    AS DOUBLE) AS sp_d
         |FROM orders WHERE year(o_orderdate) $cmp GROUP BY 1""".stripMargin
    def seg(src: String, label: String) =
      s"""SELECT o_custkey,
         |  CASE WHEN sp_d <= t1 THEN 'low'
         |       WHEN sp_d <= t2 THEN 'mid'
         |       ELSE 'high' END AS $label
         |FROM $src CROSS JOIN ${src}_th""".stripMargin
    s"""WITH h1 AS (${half("<= 1997")}),
       |h2 AS (${half(">= 1998")}),
       |h1_th AS (SELECT round(quantile_cont(sp_d, 0.333333), 6) AS t1,
       |    round(quantile_cont(sp_d, 0.666667), 6) AS t2 FROM h1),
       |h2_th AS (SELECT round(quantile_cont(sp_d, 0.333333), 6) AS t1,
       |    round(quantile_cont(sp_d, 0.666667), 6) AS t2 FROM h2),
       |s1 AS (${seg("h1", "seg1")}),
       |s2 AS (${seg("h2", "seg2")})
       |SELECT COALESCE(s1.seg1, 'none') AS seg_before,
       |  COALESCE(s2.seg2, 'none') AS seg_after,
       |  COUNT(*) AS n_cust
       |FROM s1 FULL OUTER JOIN s2 USING (o_custkey)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "s22_csv_quarantine" -> s22CsvQuarantine,
    "ml_calibration_bins" -> mlCalibrationBins,
    "q33_segment_migration" -> q33SegmentMigration)

  val oracleSql: Map[String, String] = Map(
    "s22_csv_quarantine" -> s22CsvQuarantineSql,
    "ml_calibration_bins" -> mlCalibrationBinsSql,
    "q33_segment_migration" -> q33SegmentMigrationSql)
}
