package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 sixteenth-session widening: leakage-free feature
  * extraction (point-in-time-correct training features — every
  * feature computed strictly BEFORE its label event, the discipline
  * that separates a valid training set from silent target leakage),
  * tamper-evident table checksums (order-insensitive content hashes
  * for replication/integrity audits), and per-user behavioral
  * entropy rate (how predictable is each user's event stream).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and
  * frozen as DECIMAL before any reordering sum, total ORDER BYs.
  */
object Frontier12Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // ev_feature_snapshot — point-in-time-correct features for every
  // purchase event: counts of the user's PRIOR clicks/views/errors
  // and the seconds since their previous purchase, all from windows
  // frame-bounded at [unbounded preceding, 1 preceding] — by
  // construction nothing at-or-after the label instant can leak into
  // its features, the property a feature store must guarantee before
  // its snapshots are usable for training. Every window partitions
  // on user_id (scales with the user axis); outputs one exact-
  // integer feature row per purchase, aggregated here to a compact
  // per-feature-histogram for the driver (the row-level frame is the
  // operator; the rollup keeps the output bounded).
  // ------------------------------------------------------------------
  private val evFeatureSnapshot: QFn = (s, dir) => {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wl = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val feat = e
      .withColumn("prior_clicks",
        coalesce(sum(when(col("event_type") === "click", 1L)).over(w),
          lit(0L)))
      .withColumn("prior_views",
        coalesce(sum(when(col("event_type") === "view", 1L)).over(w),
          lit(0L)))
      .withColumn("prior_errors",
        coalesce(sum(when(col("event_type") === "error", 1L)).over(w),
          lit(0L)))
      .withColumn("prev_purch_sec",
        last(when(col("event_type") === "purchase", col("sec")),
          ignoreNulls = true).over(
          wl.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("prior_clicks"), col("prior_views"),
        col("prior_errors"),
        (col("sec") - col("prev_purch_sec")).as("gap_s"))
    feat.groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("prior_clicks")).as("sum_prior_clicks"),
        sum(col("prior_views")).as("sum_prior_views"),
        sum(col("prior_errors")).as("sum_prior_errors"),
        coalesce(min(col("gap_s")), lit(-1L)).cast("long").as("min_gap_s"))
      .orderBy("user_id")
  }
  private val evFeatureSnapshotSql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events),
      |f AS (SELECT user_id, event_type, sec,
      |    COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
      |      OVER wp, 0) AS prior_clicks,
      |    COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
      |      OVER wp, 0) AS prior_views,
      |    COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END)
      |      OVER wp, 0) AS prior_errors,
      |    last_value(CASE WHEN event_type = 'purchase' THEN sec END
      |      IGNORE NULLS) OVER wp AS prev_purch_sec
      |  FROM e
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT user_id, prior_clicks, prior_views, prior_errors,
      |    sec - prev_purch_sec AS gap_s
      |  FROM f WHERE event_type = 'purchase')
      |SELECT user_id, COUNT(*) AS n_purchases,
      |  CAST(SUM(prior_clicks) AS BIGINT) AS sum_prior_clicks,
      |  CAST(SUM(prior_views) AS BIGINT) AS sum_prior_views,
      |  CAST(SUM(prior_errors) AS BIGINT) AS sum_prior_errors,
      |  CAST(COALESCE(MIN(gap_s), -1) AS BIGINT) AS min_gap_s
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // x9_integrity_checksum — tamper-evident table fingerprints: each
  // row hashes (sha256 of its canonical string form, first 15 hex
  // digits as a BIGINT) and the table checksum is the SUM of row
  // hashes — an ORDER-INSENSITIVE fold, so any two replicas compute
  // the identical fingerprint regardless of partitioning, file
  // layout, or scan order, and a single flipped byte shifts the sum.
  // The per-table row count rides along (sum+count detects the
  // classic "delete one row, add another" pairing better than either
  // alone). One scan per table, combiner-friendly aggregation — the
  // replication-audit primitive at any scale.
  // ------------------------------------------------------------------
  private val x9IntegrityChecksum: QFn = (s, dir) => {
    def fp(name: String, keyCols: Seq[String]): DataFrame = {
      val h = conv(substring(sha2(concat_ws("|",
        keyCols.map(col): _*), 256), 1, 15), 16, 10).cast("long")
      t(s, dir, name).select(h.cast(DecimalType(20, 0)).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h")).cast(DecimalType(38, 0)).cast("string").as("content_sum"))
        .select(lit(name).as("tbl"), col("n_rows"), col("content_sum"))
    }
    fp("nation", Seq("n_nationkey", "n_name"))
      .unionByName(fp("region", Seq("r_regionkey", "r_name")))
      .unionByName(fp("customer", Seq("c_custkey", "c_name",
        "c_nationkey", "c_mktsegment")))
      .unionByName(fp("supplier", Seq("s_suppkey", "s_name",
        "s_nationkey")))
      .orderBy("tbl")
  }
  private val x9IntegrityChecksumSql = {
    def fp(name: String, cols: Seq[String]) = {
      val cc = cols.map(c => s"CAST($c AS VARCHAR)").mkString(" || '|' || ")
      s"""SELECT '$name' AS tbl, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(CAST(('0x' || substring(sha256($cc), 1, 15))
         |    AS BIGINT) AS DECIMAL(20,0))) AS VARCHAR) AS content_sum
         |FROM $name""".stripMargin
    }
    s"""${fp("nation", Seq("n_nationkey", "n_name"))}
       |UNION ALL
       |${fp("region", Seq("r_regionkey", "r_name"))}
       |UNION ALL
       |${fp("customer", Seq("c_custkey", "c_name", "c_nationkey",
            "c_mktsegment"))}
       |UNION ALL
       |${fp("supplier", Seq("s_suppkey", "s_name", "s_nationkey"))}
       |ORDER BY tbl""".stripMargin
  }

  // ------------------------------------------------------------------
  // ev_entropy_rate — first-order behavioral entropy rate per user:
  // H = −Σ_{a,b} p(a)·p(b|a)·ln p(b|a) over the user's event-type
  // transition matrix (domain-bounded: ≤5×5 per user). Transition
  // counts come from one lead() over the user partition + a groupBy
  // on (user, a, b); each −p·ln p term is ONE rounded double frozen
  // as DECIMAL so the per-user sum is exact. Low entropy = scripted/
  // bot-like behavior, high = erratic — the feature behind the
  // bot-detection pack's predictability signal. Output: the entropy
  // distribution in 0.25-nat buckets (bounded), with per-bucket user
  // counts and the id checksum.
  // ------------------------------------------------------------------
  private val evEntropyRate: QFn = (s, dir) => {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val trans = e.withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"), col("event_type").as("a"),
        col("nxt").as("b"))
      .agg(count(lit(1)).as("nab"))
    val rowTot = trans.groupBy("user_id", "a").agg(sum("nab").as("na"))
    val tot = trans.groupBy("user_id").agg(sum("nab").as("nt"))
    val terms = trans.join(rowTot, Seq("user_id", "a"))
      .join(tot, "user_id")
      .select(col("user_id"),
        round((col("na").cast("double") / col("nt").cast("double")) *
          (col("nab").cast("double") / col("na").cast("double")) *
          negate(log(col("nab").cast("double") / col("na").cast("double"))),
          6).cast(DecimalType(18, 6)).as("term"))
    val perUser = terms.groupBy("user_id").agg(sum(col("term")).as("hd"))
      .select(col("user_id"),
        floor(col("hd").cast("double") / 0.25).cast("long").as("bucket"))
    perUser.groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        sum(col("user_id")).cast("long").as("id_checksum"))
      .orderBy("bucket")
  }
  private val evEntropyRateSql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events),
      |tr AS (SELECT user_id, event_type AS a,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY sec, event_id) AS b
      |  FROM e),
      |trn AS (SELECT user_id, a, b, COUNT(*) AS nab FROM tr
      |        WHERE b IS NOT NULL GROUP BY 1, 2, 3),
      |rt AS (SELECT user_id, a, SUM(nab) AS na FROM trn GROUP BY 1, 2),
      |tt AS (SELECT user_id, SUM(nab) AS nt FROM trn GROUP BY 1),
      |terms AS (SELECT trn.user_id,
      |    CAST(round((CAST(rt.na AS DOUBLE) / CAST(tt.nt AS DOUBLE))
      |      * (CAST(trn.nab AS DOUBLE) / CAST(rt.na AS DOUBLE))
      |      * (-ln(CAST(trn.nab AS DOUBLE) / CAST(rt.na AS DOUBLE))), 6)
      |      AS DECIMAL(18,6)) AS term
      |  FROM trn JOIN rt ON rt.user_id = trn.user_id AND rt.a = trn.a
      |  JOIN tt ON tt.user_id = trn.user_id),
      |pu AS (SELECT user_id,
      |    CAST(floor(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) / 0.25)
      |      AS BIGINT) AS bucket
      |  FROM terms GROUP BY 1)
      |SELECT bucket, COUNT(*) AS n_users,
      |  CAST(SUM(user_id) AS BIGINT) AS id_checksum
      |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ev_feature_snapshot" -> evFeatureSnapshot,
    "x9_integrity_checksum" -> x9IntegrityChecksum,
    "ev_entropy_rate" -> evEntropyRate)

  val oracleSql: Map[String, String] = Map(
    "ev_feature_snapshot" -> evFeatureSnapshotSql,
    "x9_integrity_checksum" -> x9IntegrityChecksumSql,
    "ev_entropy_rate" -> evEntropyRateSql)
}
