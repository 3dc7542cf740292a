package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 eleventh-session widening: financial drawdown analytics
  * (running-peak shortfall over the daily revenue series), graph link
  * prediction (Adamic–Adar scores for unlinked part pairs over the
  * co-purchase graph), and a BITEMPORAL dimension query (valid-time ×
  * transaction-time as-of resolution — the axis SCD2 alone cannot
  * answer: "what did we BELIEVE on day T the state at day V was?").
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs (frozen as
  * DECIMAL(18,6) before any reordering sum), total ORDER BYs.
  */
object Frontier7Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // w20_max_drawdown — peak-to-trough shortfall of the daily revenue
  // series: D_t = max_{s≤t}(rev_s) − rev_t, the classic risk metric.
  // The daily rollup is the only data-sized work (one groupBy of the
  // fact table); the running maximum and the drawdown are exact
  // decimal window arithmetic over the calendar-bounded series, so
  // no recursion and no floating point anywhere. Output: every day's
  // drawdown plus its running peak, flagged at the global maximum
  // drawdown (ties flag every achieving day — deterministic).
  // ------------------------------------------------------------------
  private val w20MaxDrawdown: QFn = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)))
        .cast(DecimalType(18, 2)).as("rev"))
    val wPre = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
    val dd = daily
      .withColumn("peak", max(col("rev")).over(wPre))
      .withColumn("dd", col("peak") - col("rev"))
    dd.withColumn("max_dd", max(col("dd")).over(wAll))
      .select(col("d"),
        col("rev").cast("string").cast("double").as("rev_d"),
        col("peak").cast("string").cast("double").as("peak_d"),
        col("dd").cast("string").cast("double").as("dd_d"),
        when(col("dd") === col("max_dd"), 1).otherwise(0).as("is_max_dd"))
      .orderBy("d")
  }
  private val w20MaxDrawdownSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
      |      AS rev
      |  FROM orders GROUP BY 1),
      |dd AS (SELECT d, rev,
      |    MAX(rev) OVER (ORDER BY d) AS peak,
      |    MAX(rev) OVER (ORDER BY d) - rev AS ddv
      |  FROM daily),
      |mx AS (SELECT d, rev, peak, ddv, MAX(ddv) OVER () AS max_dd FROM dd)
      |SELECT d, CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev_d,
      |  CAST(CAST(peak AS VARCHAR) AS DOUBLE) AS peak_d,
      |  CAST(CAST(ddv AS VARCHAR) AS DOUBLE) AS dd_d,
      |  CASE WHEN ddv = max_dd THEN 1 ELSE 0 END AS is_max_dd
      |FROM mx ORDER BY d""".stripMargin

  // ------------------------------------------------------------------
  // g_adamic_adar — link prediction over the co-purchase graph:
  // Adamic–Adar score Σ_{w ∈ N(a)∩N(b)} 1/ln(deg w) for part pairs
  // NOT already linked, via the wedge join (center w joins its
  // capped neighbor list with itself). Degrees — and each center's
  // 1/ln(deg) weight, ONE rounded double frozen as DECIMAL(18,6) —
  // are computed on the FULL graph before the per-node top-30
  // neighbor cap (g_two_hop_recs' hub-bounding discipline) limits
  // wedge fan-out to 30², so hub nodes cannot blow up the join at
  // any scale. Existing edges leave via one anti-join; the top-20
  // pairs come from the two-phase rankTopK (no global sort).
  // ------------------------------------------------------------------
  private val gAdamicAdar: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
      .localCheckpoint(true)
    val e = e0.select(col("pa").as("src"), col("pb").as("dst"), col("n_both"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst"),
        col("n_both")))
    val deg = e.groupBy(col("src").as("w")).agg(count(lit(1)).as("deg"))
    val capped = e
      .withColumn("rn", row_number().over(Window.partitionBy("src")
        .orderBy(col("n_both").desc, col("dst"))))
      .filter(col("rn") <= 30)
      .select(col("src"), col("dst"))
    val wedges = capped.select(col("src").as("w"), col("dst").as("x"))
      .join(capped.select(col("src").as("w"), col("dst").as("y")), "w")
      .filter(col("x") < col("y"))
      .join(broadcast(deg), "w")
      .select(col("x"), col("y"),
        round(lit(1.0) / log(col("deg").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("aaw"))
    val scored = wedges.groupBy("x", "y")
      .agg(sum(col("aaw")).as("aa"), count(lit(1)).as("n_common"))
      .join(e0.select(col("pa").as("x"), col("pb").as("y"), lit(1).as("ex")),
        Seq("x", "y"), "left_anti")
      .select(col("x").as("pa"), col("y").as("pb"), col("n_common"),
        round(col("aa").cast("double"), 6).as("aa_r"))
    graft.operators.TopK.rankTopK(scored, 20,
        Seq(col("aa_r").desc, col("pa").asc, col("pb").asc), "rnk")
      .select(col("rnk"), col("pa"), col("pb"), col("n_common"), col("aa_r"))
      .orderBy("rnk")
  }
  private val gAdamicAdarSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
      |         COUNT(*) AS n_both
      |       FROM op a JOIN op b USING (l_orderkey)
      |       WHERE a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa AS src, pb AS dst, n_both FROM e0
      |      UNION ALL SELECT pb, pa, n_both FROM e0),
      |deg AS (SELECT src AS w, COUNT(*) AS deg FROM e GROUP BY 1),
      |capped AS (SELECT src, dst FROM e
      |  QUALIFY row_number() OVER (PARTITION BY src
      |    ORDER BY n_both DESC, dst) <= 30),
      |wedges AS (SELECT cx.dst AS x, cy.dst AS y,
      |    CAST(round(1.0 / ln(CAST(deg.deg AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS aaw
      |  FROM capped cx JOIN capped cy ON cx.src = cy.src
      |  JOIN deg ON deg.w = cx.src
      |  WHERE cx.dst < cy.dst),
      |sc AS (SELECT w.x, w.y, SUM(w.aaw) AS aa, COUNT(*) AS n_common
      |  FROM wedges w GROUP BY 1, 2),
      |nf AS (SELECT sc.x AS pa, sc.y AS pb, sc.n_common,
      |    round(CAST(CAST(sc.aa AS VARCHAR) AS DOUBLE), 6) AS aa_r
      |  FROM sc WHERE NOT EXISTS (SELECT 1 FROM e0
      |    WHERE e0.pa = sc.x AND e0.pb = sc.y))
      |SELECT CAST(rank() OVER (ORDER BY aa_r DESC, pa, pb) AS INT) AS rnk,
      |  pa, pb, n_common, aa_r
      |FROM nf
      |QUALIFY rnk <= 20
      |ORDER BY rnk""".stripMargin

  // ------------------------------------------------------------------
  // i23_bitemporal — bitemporal dimension resolution. Each customer
  // carries up to three segment versions on TWO time axes: valid_from
  // (when the change took effect in the world) and tx_from (when the
  // warehouse RECORDED it — always later, by a deterministic
  // md5-derived lag, so the axes genuinely disagree). The query
  // answers both canonical reads in one result: the CORRECTED view
  // ("state at valid day 450 with everything we know now") and the
  // AS-REPORTED view ("state at valid day 450 as believed at tx day
  // 470") — per-segment customer counts, one row per (view, segment).
  // Resolution is a max-version pick per customer per view: filter
  // applicable versions on both axes, then one partitioned window.
  // SCD2 (i_scd2_intervals) stores only valid time; this entry is the
  // two-axis extension auditors and restatement reports require.
  // Everything is exact integer arithmetic off md5 — both engines
  // build byte-identical version histories.
  // ------------------------------------------------------------------
  private val i23Bitemporal: QFn = (s, dir) => {
    val segs = array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
      lit("HOUSEHOLD"), lit("MACHINERY"))
    val h = conv(substring(md5(concat(lit("bt:"),
      col("c_custkey").cast("string"))), 1, 13), 16, 10).cast("long")
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), h.as("h"))
    // version 0: the original row, valid and recorded from day 0
    val v0 = c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
      lit(0L).as("valid_from"), lit(0L).as("tx_from"))
    // version 1 (all customers): effective 100..299, recorded 0..29 late
    val v1 = c.select(col("c_custkey"),
      element_at(segs, (col("h") % 5 + 1).cast("int")).as("segment"),
      (lit(100L) + col("h") % 200).as("valid_from"))
      .withColumn("tx_from", col("valid_from") +
        conv(substring(md5(concat(lit("btx:"),
          col("c_custkey").cast("string"))), 1, 13), 16, 10).cast("long") % 30)
    // version 2 (every 3rd customer): effective 400..699, recorded
    // 0..59 late — late enough that the two views disagree
    val v2 = c.filter(col("h") % 3 === 0)
      .select(col("c_custkey"),
        element_at(segs, (expr("h div 5") % 5 + 1).cast("int")).as("segment"),
        (lit(400L) + col("h") % 300).as("valid_from"))
      .withColumn("tx_from", col("valid_from") +
        conv(substring(md5(concat(lit("bty:"),
          col("c_custkey").cast("string"))), 1, 13), 16, 10).cast("long") % 60)
    val versions = v0.unionByName(v1).unionByName(v2)
    def resolve(validAt: Long, txAt: Long, label: String): DataFrame =
      versions
        .filter(col("valid_from") <= validAt && col("tx_from") <= txAt)
        .withColumn("rn", row_number().over(
          Window.partitionBy("c_custkey")
            .orderBy(col("valid_from").desc, col("tx_from").desc)))
        .filter(col("rn") === 1)
        .groupBy("segment").agg(count(lit(1)).as("n_cust"))
        .select(lit(label).as("view"), col("segment"), col("n_cust"))
    resolve(450L, 100000L, "corrected")
      .unionByName(resolve(450L, 470L, "as_reported"))
      .orderBy("view", "segment")
  }
  private val i23BitemporalSql = {
    val segs = "['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', " +
      "'MACHINERY']"
    def resolve(validAt: Long, txAt: Long, label: String) =
      s"""SELECT '$label' AS view, segment, COUNT(*) AS n_cust FROM (
         |  SELECT c_custkey, segment FROM versions
         |  WHERE valid_from <= $validAt AND tx_from <= $txAt
         |  QUALIFY row_number() OVER (PARTITION BY c_custkey
         |    ORDER BY valid_from DESC, tx_from DESC) = 1)
         |GROUP BY 2""".stripMargin
    s"""WITH c AS (SELECT c_custkey, c_mktsegment,
       |    CAST(('0x' || substring(md5('bt:' || CAST(c_custkey AS VARCHAR)),
       |      1, 13)) AS BIGINT) AS h
       |  FROM customer),
       |v0 AS (SELECT c_custkey, c_mktsegment AS segment,
       |         CAST(0 AS BIGINT) AS valid_from, CAST(0 AS BIGINT) AS tx_from
       |       FROM c),
       |v1 AS (SELECT c_custkey,
       |    ($segs)[CAST(h % 5 + 1 AS INT)] AS segment,
       |    100 + h % 200 AS valid_from,
       |    100 + h % 200
       |      + CAST(('0x' || substring(md5('btx:' ||
       |          CAST(c_custkey AS VARCHAR)), 1, 13)) AS BIGINT) % 30
       |      AS tx_from
       |  FROM c),
       |v2 AS (SELECT c_custkey,
       |    ($segs)[CAST((h // 5) % 5 + 1 AS INT)] AS segment,
       |    400 + h % 300 AS valid_from,
       |    400 + h % 300
       |      + CAST(('0x' || substring(md5('bty:' ||
       |          CAST(c_custkey AS VARCHAR)), 1, 13)) AS BIGINT) % 60
       |      AS tx_from
       |  FROM c WHERE h % 3 = 0),
       |versions AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1
       |             UNION ALL SELECT * FROM v2)
       |${resolve(450L, 100000L, "corrected")}
       |UNION ALL
       |${resolve(450L, 470L, "as_reported")}
       |ORDER BY view, segment""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "w20_max_drawdown" -> w20MaxDrawdown,
    "g_adamic_adar" -> gAdamicAdar,
    "i23_bitemporal" -> i23Bitemporal)

  val oracleSql: Map[String, String] = Map(
    "w20_max_drawdown" -> w20MaxDrawdownSql,
    "g_adamic_adar" -> gAdamicAdarSql,
    "i23_bitemporal" -> i23BitemporalSql)
}
