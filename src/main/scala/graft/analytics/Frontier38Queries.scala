package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, twenty-sixth pack: the two-proportion z-test
  * (THE A/B readout — difference of rates with its pooled-variance
  * z and CI, completing the Wilson/power/SRM experimentation
  * toolkit), the erasure certificate (before/after integrity
  * checksums proving a targeted delete removed EXACTLY the subject's
  * rows — the auditable artifact a privacy request closes with),
  * and Lincoln–Petersen capture–recapture (estimate a population
  * from two overlapping hash samples — the cheap cardinality
  * estimator that needs no sketch state at all).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier38Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // a59_two_proportion — BUILDING vs AUTOMOBILE urgent-order rates:
  // difference of proportions with the pooled-variance z statistic
  // (the test statistic every A/B dashboard quotes), the unpooled
  // 95% CI of the difference, and the verdict at α = 0.05. All from
  // exact (k, n) pairs — ONE aggregation, then closed-form doubles
  // with shared literals.
  // ------------------------------------------------------------------
  private val a59TwoProportion: QFn = (s, dir) => {
    val st = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).cast("long").as("k"))
    val wide = st.agg(
      max(when(col("c_mktsegment") === "BUILDING", col("n"))).as("n1"),
      max(when(col("c_mktsegment") === "BUILDING", col("k"))).as("k1"),
      max(when(col("c_mktsegment") === "AUTOMOBILE", col("n"))).as("n2"),
      max(when(col("c_mktsegment") === "AUTOMOBILE", col("k"))).as("k2"))
    val n1 = col("n1").cast("double"); val k1 = col("k1").cast("double")
    val n2 = col("n2").cast("double"); val k2 = col("k2").cast("double")
    val p1 = k1 / n1; val p2 = k2 / n2
    val pPool = (k1 + k2) / (n1 + n2)
    val z = (p1 - p2) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / n1 + lit(1.0) / n2))
    val half = lit(1.959964) *
      sqrt(p1 * (lit(1.0) - p1) / n1 + p2 * (lit(1.0) - p2) / n2)
    wide.select(col("n1"), col("k1"), col("n2"), col("k2"),
      round(p1 - p2, 6).as("diff_r"),
      round(z, 6).as("z_r"),
      round(p1 - p2 - half, 6).as("ci_lo_r"),
      round(p1 - p2 + half, 6).as("ci_hi_r"),
      (abs(z) > 1.959964).as("significant"))
  }
  private val a59TwoProportionSql =
    """WITH st AS (SELECT c_mktsegment, COUNT(*) AS n,
      |    SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
      |      AS k
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      |  GROUP BY 1),
      |w AS (SELECT
      |    CAST(MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN n END)
      |      AS BIGINT) AS n1,
      |    CAST(MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN k END)
      |      AS BIGINT) AS k1,
      |    CAST(MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n END)
      |      AS BIGINT) AS n2,
      |    CAST(MAX(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN k END)
      |      AS BIGINT) AS k2
      |  FROM st),
      |d AS (SELECT n1, k1, n2, k2,
      |    CAST(n1 AS DOUBLE) AS n1d, CAST(k1 AS DOUBLE) AS k1d,
      |    CAST(n2 AS DOUBLE) AS n2d, CAST(k2 AS DOUBLE) AS k2d
      |  FROM w)
      |SELECT n1, k1, n2, k2,
      |  round(k1d / n1d - k2d / n2d, 6) AS diff_r,
      |  round((k1d / n1d - k2d / n2d)
      |    / sqrt(((k1d + k2d) / (n1d + n2d))
      |      * (1.0 - (k1d + k2d) / (n1d + n2d))
      |      * (1.0 / n1d + 1.0 / n2d)), 6) AS z_r,
      |  round(k1d / n1d - k2d / n2d - 1.959964
      |    * sqrt((k1d / n1d) * (1.0 - k1d / n1d) / n1d
      |      + (k2d / n2d) * (1.0 - k2d / n2d) / n2d), 6) AS ci_lo_r,
      |  round(k1d / n1d - k2d / n2d + 1.959964
      |    * sqrt((k1d / n1d) * (1.0 - k1d / n1d) / n1d
      |      + (k2d / n2d) * (1.0 - k2d / n2d) / n2d), 6) AS ci_hi_r,
      |  abs((k1d / n1d - k2d / n2d)
      |    / sqrt(((k1d + k2d) / (n1d + n2d))
      |      * (1.0 - (k1d + k2d) / (n1d + n2d))
      |      * (1.0 / n1d + 1.0 / n2d))) > 1.959964 AS significant
      |FROM d""".stripMargin

  // ------------------------------------------------------------------
  // x19_erasure_proof — the auditable erasure certificate: for the
  // md5-chosen data subject (one customer), the order table's
  // order-insensitive content checksum (the x9 sum-of-row-hash
  // fingerprint) is computed BEFORE and AFTER the targeted delete,
  // and the certificate proves checksum_before − checksum_after
  // equals EXACTLY the subject's rows' contribution — i.e., the
  // delete removed everything it should and nothing it shouldn't.
  // All three sums come from one scan (conditional aggregation);
  // no second pass, no trust required.
  // ------------------------------------------------------------------
  private val x19ErasureProof: QFn = (s, dir) => {
    val custs = t(s, dir, "customer").select(col("c_custkey"),
      md5(concat(lit("er:"), col("c_custkey").cast("string"))).as("h"))
    val subject = graft.operators.TopK.rankTopK(custs, 1,
        Seq(col("h").asc, col("c_custkey").asc), "rk")
      .filter(col("rk") === 1).select(col("c_custkey").as("subj"))
    // the price routes through DECIMAL(18,4) before stringifying —
    // double→string formats diverge across engines, decimal strings
    // do not
    val rowHash = conv(substring(sha2(concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_totalprice").cast(DecimalType(18, 4)).cast("string")),
      256), 1, 15), 16, 10)
      .cast("long").cast(DecimalType(20, 0))
    t(s, dir, "orders").crossJoin(broadcast(subject))
      .select(col("o_custkey"), col("subj"), rowHash.as("rh"))
      .agg(max(col("subj")).as("subject_key"),
        count(lit(1)).as("rows_before"),
        sum(when(col("o_custkey") =!= col("subj"), 1L).otherwise(0L))
          .cast("long").as("rows_after"),
        sum(col("rh")).cast(DecimalType(38, 0)).as("sum_before"),
        sum(when(col("o_custkey") =!= col("subj"), col("rh")))
          .cast(DecimalType(38, 0)).as("sum_after"),
        sum(when(col("o_custkey") === col("subj"), col("rh")))
          .cast(DecimalType(38, 0)).as("subject_sum"))
      .select(col("subject_key"), col("rows_before"), col("rows_after"),
        (col("rows_before") - col("rows_after")).as("rows_erased"),
        col("sum_before").cast("string").as("checksum_before"),
        col("sum_after").cast("string").as("checksum_after"),
        (col("sum_before") - col("sum_after") === col("subject_sum"))
          .as("erasure_exact"))
  }
  private val x19ErasureProofSql =
    """WITH subj AS (SELECT c_custkey AS subj FROM (
      |    SELECT c_custkey,
      |      md5('er:' || CAST(c_custkey AS VARCHAR)) AS h
      |    FROM customer)
      |  QUALIFY rank() OVER (ORDER BY h, c_custkey) = 1),
      |r AS (SELECT o_custkey, subj.subj,
      |    CAST(CAST(('0x' || substring(sha256(
      |      CAST(o_orderkey AS VARCHAR) || '|'
      |      || CAST(o_custkey AS VARCHAR) || '|'
      |      || CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)),
      |      1, 15)) AS BIGINT)
      |      AS DECIMAL(20,0)) AS rh
      |  FROM orders CROSS JOIN subj)
      |SELECT MAX(subj) AS subject_key,
      |  COUNT(*) AS rows_before,
      |  CAST(SUM(CASE WHEN o_custkey <> subj THEN 1 ELSE 0 END)
      |    AS BIGINT) AS rows_after,
      |  COUNT(*) - CAST(SUM(CASE WHEN o_custkey <> subj THEN 1
      |    ELSE 0 END) AS BIGINT) AS rows_erased,
      |  CAST(CAST(SUM(rh) AS DECIMAL(38,0)) AS VARCHAR)
      |    AS checksum_before,
      |  CAST(CAST(SUM(CASE WHEN o_custkey <> subj THEN rh END)
      |    AS DECIMAL(38,0)) AS VARCHAR) AS checksum_after,
      |  CAST(SUM(rh) AS DECIMAL(38,0))
      |    - CAST(SUM(CASE WHEN o_custkey <> subj THEN rh END)
      |      AS DECIMAL(38,0))
      |    = CAST(SUM(CASE WHEN o_custkey = subj THEN rh END)
      |      AS DECIMAL(38,0)) AS erasure_exact
      |FROM r""".stripMargin

  // ------------------------------------------------------------------
  // a60_capture_recapture — Lincoln–Petersen population estimation
  // from two deterministic hash samples of the document corpus
  // (capture: md5("c1:"+id)%5=0, recapture: md5("c2:"+id)%5=0 —
  // independent 20% samples by construction): N̂ = n₁·n₂/m with the
  // Chapman small-sample correction (n₁+1)(n₂+1)/(m+1) − 1, both
  // compared against the TRUE count riding alongside. The estimator
  // needs only three counts — the zero-state cardinality check for
  // pipelines where even an HLL sketch is too much coordination.
  // ------------------------------------------------------------------
  private val a60CaptureRecapture: QFn = (s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"),
      (conv(substring(md5(concat(lit("c1:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 5
        === 0).as("s1"),
      (conv(substring(md5(concat(lit("c2:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 5
        === 0).as("s2"))
    d.agg(count(lit(1)).cast("long").as("true_n"),
        sum(when(col("s1"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("s2"), 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(col("s1") && col("s2"), 1L).otherwise(0L))
          .cast("long").as("m"))
      .select(col("true_n"), col("n1"), col("n2"), col("m"),
        when(col("m") === 0, lit(0.0))
          .otherwise(round(col("n1").cast("double") *
            col("n2").cast("double") / col("m").cast("double"), 2))
          .as("lincoln_petersen_r"),
        round((col("n1") + 1).cast("double") *
          (col("n2") + 1).cast("double") /
          (col("m") + 1).cast("double") - 1.0, 2).as("chapman_r"))
  }
  private val a60CaptureRecaptureSql =
    """WITH d AS (SELECT doc_id,
      |    CAST(('0x' || substring(md5('c1:'
      |      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
      |      AS s1,
      |    CAST(('0x' || substring(md5('c2:'
      |      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
      |      AS s2
      |  FROM documents)
      |SELECT COUNT(*) AS true_n,
      |  CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS m,
      |  CASE WHEN SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) = 0
      |    THEN 0.0
      |    ELSE round(CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END)
      |        AS DOUBLE)
      |      * CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END)
      |        AS DOUBLE), 2) END AS lincoln_petersen_r,
      |  round(CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) + 1 AS DOUBLE)
      |    * CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) + 1 AS DOUBLE)
      |    / CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) + 1
      |      AS DOUBLE) - 1.0, 2) AS chapman_r
      |FROM d""".stripMargin

  val queries: Map[String, QFn] = Map(
    "a59_two_proportion" -> a59TwoProportion,
    "x19_erasure_proof" -> x19ErasureProof,
    "a60_capture_recapture" -> a60CaptureRecapture)

  val oracleSql: Map[String, String] = Map(
    "a59_two_proportion" -> a59TwoProportionSql,
    "x19_erasure_proof" -> x19ErasureProofSql,
    "a60_capture_recapture" -> a60CaptureRecaptureSql)
}
