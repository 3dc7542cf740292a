package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 widening, fourteenth pack: the recursive-CTE SQL front
  * door (Spark 4's WITH RECURSIVE — hierarchy walks expressed in
  * pure SQL, the last big ANSI surface the engine gained), a salting
  * skew report (bucket-occupancy numbers that QUANTIFY why a skewed
  * join key needs salting — the scale story stated as data), and
  * language-ID evaluation against the labeled corpus (the heuristic
  * classifier scored like any model: confusion counts + per-class
  * accuracy).
  *
  * House determinism rules: exact integer arithmetic throughout;
  * doubles are single rounded expressions; total ORDER BYs.
  */
object Frontier26Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // sql_recursive_cte — WITH RECURSIVE through spark.sql(...): the
  // supplier keys induce a synthetic decimal-trie hierarchy
  // (parent = key div 10 — e.g. 4217 → 421 → 42 → 4, a determinate
  // forest with max depth ⌈log₁₀(max key)⌉), and the recursion walks
  // every root-to-node chain, accumulating depth. The aggregate per
  // depth (node count + key checksum) pins the whole closure. This
  // is the operator a warehouse uses for org charts and BOM
  // explosions; Spark executes it as UnionLoop with per-step reuse —
  // each iteration shuffles only the frontier, so a shallow wide
  // hierarchy (the common case) costs depth × frontier scans.
  // DuckDB runs the IDENTICAL text.
  // ------------------------------------------------------------------
  private val sqlRecursiveCte: QFn = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH RECURSIVE walk AS (
        |  SELECT s_suppkey AS node, 0 AS depth
        |  FROM supplier WHERE s_suppkey < 10
        |  UNION ALL
        |  SELECT sup.s_suppkey, w.depth + 1
        |  FROM supplier sup JOIN walk w
        |    ON sup.s_suppkey >= 10 AND sup.s_suppkey div 10 = w.node
        |)
        |SELECT depth, COUNT(*) AS n_nodes,
        |  CAST(SUM(node) AS BIGINT) AS key_checksum
        |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
  }
  private val sqlRecursiveCteSql =
    """WITH RECURSIVE walk AS (
      |  SELECT s_suppkey AS node, 0 AS depth
      |  FROM supplier WHERE s_suppkey < 10
      |  UNION ALL
      |  SELECT sup.s_suppkey, w.depth + 1
      |  FROM supplier sup JOIN walk w
      |    ON sup.s_suppkey >= 10 AND sup.s_suppkey // 10 = w.node
      |)
      |SELECT depth, COUNT(*) AS n_nodes,
      |  CAST(SUM(node) AS BIGINT) AS key_checksum
      |FROM walk GROUP BY depth ORDER BY depth""".stripMargin

  // ------------------------------------------------------------------
  // s27_skew_report — why salting: bucket the lineitem stream by the
  // md5-bucket of a 3-valued key (l_returnflag — the classic
  // low-cardinality join key) into 32 "reducers", then re-bucket the
  // SALTED key (flag ⊕ md5(orderkey,linenumber) % 8). The report
  // states occupancy, the largest bucket, and the max/ideal skew
  // factor for both strategies — the number that explains a straggler
  // task to anyone. All bucketing is engine-portable md5 arithmetic
  // (NOT the engine's internal hash), so the oracle reproduces it
  // bit-for-bit; the real join would shuffle exactly these volumes.
  // ------------------------------------------------------------------
  private val s27SkewReport: QFn = (s, dir) => {
    def b(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long") % 32
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      .localCheckpoint(true)
    val plain = li.select(b(col("l_returnflag")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("occupied"), max(col("n")).as("mx"),
        sum(col("n")).as("total"))
      .select(lit("plain").as("strategy"), col("occupied"),
        col("mx").cast("long").as("largest_bucket"),
        col("total").cast("long").as("total_rows"),
        round(col("mx").cast("double") /
          (col("total").cast("double") / 32.0), 6).as("skew_factor_r"))
    val salted = li.select(b(concat(col("l_returnflag"), lit("#"),
        (conv(substring(md5(concat(col("l_orderkey").cast("string"),
          lit(":"), col("l_linenumber").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 8).cast("string"))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("occupied"), max(col("n")).as("mx"),
        sum(col("n")).as("total"))
      .select(lit("salted").as("strategy"), col("occupied"),
        col("mx").cast("long").as("largest_bucket"),
        col("total").cast("long").as("total_rows"),
        round(col("mx").cast("double") /
          (col("total").cast("double") / 32.0), 6).as("skew_factor_r"))
    plain.unionByName(salted).orderBy("strategy")
  }
  private val s27SkewReportSql =
    """WITH li AS (SELECT l_returnflag, l_orderkey, l_linenumber
      |  FROM lineitem),
      |p AS (SELECT CAST(('0x' || substring(md5(l_returnflag), 1, 8))
      |      AS BIGINT) % 32 AS bucket
      |  FROM li),
      |pa AS (SELECT COUNT(*) AS occupied, MAX(n) AS mx, SUM(n) AS total
      |  FROM (SELECT bucket, COUNT(*) AS n FROM p GROUP BY 1)),
      |sk AS (SELECT CAST(('0x' || substring(md5(l_returnflag || '#'
      |      || CAST(CAST(('0x' || substring(md5(
      |        CAST(l_orderkey AS VARCHAR) || ':'
      |        || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 8
      |        AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS bucket
      |  FROM li),
      |sa AS (SELECT COUNT(*) AS occupied, MAX(n) AS mx, SUM(n) AS total
      |  FROM (SELECT bucket, COUNT(*) AS n FROM sk GROUP BY 1))
      |SELECT strategy, occupied,
      |  CAST(mx AS BIGINT) AS largest_bucket,
      |  CAST(total AS BIGINT) AS total_rows,
      |  round(CAST(mx AS DOUBLE) / (CAST(total AS DOUBLE) / 32.0), 6)
      |    AS skew_factor_r
      |FROM (SELECT 'plain' AS strategy, * FROM pa
      |      UNION ALL SELECT 'salted', * FROM sa)
      |ORDER BY strategy""".stripMargin

  // ------------------------------------------------------------------
  // t_langid_eval — the language-ID heuristic scored against the
  // corpus's ground-truth lang labels: full confusion counts
  // (true lang × predicted lang) plus per-class accuracy — the
  // honest way to ship a heuristic classifier (t_lang_id emits its
  // predictions; THIS entry says how often they're right, per
  // class). One scan, one groupBy on the (truth, prediction) pair;
  // the per-class accuracy joins on the tiny label axis.
  // ------------------------------------------------------------------
  private val tLangidEval: QFn = (s, dir) => {
    val scored = t(s, dir, "documents")
      .select(col("lang"), TF.langId(TF.normText(col("text"))).as("pred"))
    val conf = scored.groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
    val per = conf.groupBy("lang")
      .agg(sum(col("n")).as("nt"),
        sum(when(col("lang") === col("pred"), col("n"))
          .otherwise(lit(0L))).as("nc"))
    conf.join(per, "lang")
      .select(col("lang"), col("pred"), col("n").cast("long").as("n"),
        round(col("nc").cast("double") / col("nt").cast("double"), 6)
          .as("class_accuracy_r"))
      .orderBy("lang", "pred")
  }
  private val tLangidEvalSql = {
    val pred = TF.langIdSql(TF.normTextSql("text"))
    s"""WITH sc AS (SELECT lang, $pred AS pred FROM documents),
       |conf AS (SELECT lang, pred, COUNT(*) AS n FROM sc GROUP BY 1, 2),
       |per AS (SELECT lang, SUM(n) AS nt,
       |    SUM(CASE WHEN lang = pred THEN n ELSE 0 END) AS nc
       |  FROM conf GROUP BY 1)
       |SELECT conf.lang, conf.pred, CAST(conf.n AS BIGINT) AS n,
       |  round(CAST(per.nc AS DOUBLE) / CAST(per.nt AS DOUBLE), 6)
       |    AS class_accuracy_r
       |FROM conf JOIN per ON per.lang = conf.lang
       |ORDER BY conf.lang, conf.pred""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "sql_recursive_cte" -> sqlRecursiveCte,
    "s27_skew_report" -> s27SkewReport,
    "t_langid_eval" -> tLangidEval)

  val oracleSql: Map[String, String] = Map(
    "sql_recursive_cte" -> sqlRecursiveCteSql,
    "s27_skew_report" -> s27SkewReportSql,
    "t_langid_eval" -> tLangidEvalSql)
}
