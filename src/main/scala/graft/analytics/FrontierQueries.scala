package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 fifth-session widening: weighted reservoir sampling
  * (Efraimidis–Spirakis A-Res), per-doc TF-IDF keyword extraction on
  * the native per-group top-k operator, weighted single-source (hub)
  * shortest paths via level-synchronous Bellman–Ford, and Cramér's V
  * categorical association.
  *
  * Determinism rules follow the house style (SURVEY §11): counts and
  * integer/decimal arithmetic end-to-end, log/ratio terms computed as
  * ONE double expression rounded to 6 before any reordering sum, and
  * every entry ends in a total ORDER BY.
  */
object FrontierQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // p_weighted_sample — weighted reservoir sampling (Efraimidis &
  // Spirakis 2006, A-Res): each doc draws u ~ Uniform(0,1] from a
  // salted md5 hash of its key and scores key = ln(u)/w (monotone in
  // u^(1/w)); the sample is the global top-50 by key. Inclusion
  // probability is proportional to weight (token count), yet
  // membership is a pure function of the key — re-runs, backfills and
  // multi-cluster runs agree with zero coordination, the same property
  // the split/stratified entries pin. The top-50 selection runs on the
  // two-phase TopK operator (per-partition prune, then a global window
  // over ≤ 50·partitions survivors) — no unpartitioned sort of the
  // corpus, so the plan survives a 10¹⁰-doc scan.
  // u = (h13 + 1) / 2^52 with h13 = first 13 md5 hex digits: both
  // engines divide an exact ≤2^52 integer by a power of two (exact in
  // double), take ln of the identical double, and round to 6.
  // ------------------------------------------------------------------
  private val pWeightedSample: QFn = (s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"),
      TF.wsTokenCount(col("text")).cast("long").as("w_tokens"))
    val h13 = conv(substring(md5(concat(lit("ws:"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (h13 + lit(1L)).cast("double") / lit(4.503599627370496e15)
    val scored = d.withColumn("key_r",
      round(log(u) / col("w_tokens").cast("double"), 6))
    graft.operators.TopK.rankTopK(scored, 50,
        Seq(col("key_r").desc, col("doc_id").asc), "rnk")
      .select(col("rnk"), col("doc_id"), col("w_tokens"), col("key_r"))
      .orderBy("rnk")
  }
  private val pWeightedSampleSql = {
    val w = TF.wsTokenCountSql("text")
    s"""WITH d AS (SELECT doc_id, CAST($w AS BIGINT) AS w_tokens
       |  FROM documents),
       |k AS (SELECT doc_id, w_tokens,
       |  round(ln((CAST(('0x' || substring(md5('ws:' ||
       |      CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
       |      / 4503599627370496.0)
       |    / CAST(w_tokens AS DOUBLE), 6) AS key_r FROM d)
       |SELECT CAST(rank() OVER (ORDER BY key_r DESC, doc_id) AS INT)
       |  AS rnk, doc_id, w_tokens, key_r
       |FROM k
       |QUALIFY rnk <= 50
       |ORDER BY rnk""".stripMargin
  }

  // ------------------------------------------------------------------
  // t_tfidf_topterms — per-doc keyword extraction: tf·idf with
  // idf = ln(N/df), top-3 terms per doc. The corpus pass is two
  // groupBys (doc-term tf, then term df); each distinct term's idf is
  // ONE double ln rounded to 6 and frozen as DECIMAL(18,6), so
  // score = tf · idf_r is exact and the per-doc ranking is
  // engine-independent. The top-3-per-doc runs on the NATIVE
  // per-group top-k operator (plans/TopKPerGroup): a k-bounded heap
  // per input partition caps the exchange at 3·partitions rows per
  // doc — no full sort of the doc-term matrix, the 100 TB shape for
  // "give me keywords for every document in the corpus".
  // ------------------------------------------------------------------
  private val tTfidfTop: QFn = (s, dir) => {
    val words = t(s, dir, "documents").select(col("doc_id"),
        explode(split(TF.normText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = t(s, dir, "documents").agg(count(lit(1)).as("n"))
    val scored = tf.join(dfx, "term").crossJoin(broadcast(nd))
      .withColumn("score",
        round(log(col("n").cast("double") / col("df").cast("double")), 6)
          .cast(DecimalType(18, 6)) * col("tf"))
    graft.plans.TopKPerGroup.topK(scored, Seq("doc_id"),
        Seq(("score", true), ("term", false)), k = 3)
      .select(col("doc_id"), col("term"), col("tf"),
        col("score").cast("string").cast("double").as("score"))
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }
  private val tTfidfTopSql = {
    val norm = TF.normTextSql("text")
    s"""WITH w0 AS (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
       |  FROM documents),
       |w AS (SELECT doc_id, term FROM w0 WHERE length(term) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT COUNT(*) AS n FROM documents),
       |sc AS (SELECT doc_id, term, tf,
       |  CAST(round(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 6)
       |       AS DECIMAL(18,6)) * tf AS score
       |  FROM tf JOIN dfx USING (term) CROSS JOIN nd)
       |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       |  CAST(CAST(score AS VARCHAR) AS DOUBLE) AS score
       |FROM sc
       |QUALIFY row_number() OVER (PARTITION BY doc_id
       |  ORDER BY score DESC, term) <= 3
       |ORDER BY doc_id, score DESC, term""".stripMargin
  }

  // ------------------------------------------------------------------
  // g_sssp_hubs — weighted shortest path to the nearest hub over the
  // co-purchase graph (g_bfs_layers' edge derivation, plus an integer
  // edge cost inversely tied to co-purchase strength): every 100th
  // part is a hub at distance 0, then 3 level-synchronous
  // Bellman–Ford relaxation rounds — each round ONE frontier-edge
  // join + a min-aggregate, lineage cut per round (the CC/KCore
  // discipline). Distances are exact integers; level-synchronous
  // rounds are engine-independent, so the oracle replays them as
  // chained CTEs. Emits the distance histogram + id checksum.
  // ------------------------------------------------------------------
  private val gSsspHubs: QFn = (s, dir) => {
    val op = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val e0 = a.join(b, "l_orderkey").filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
      .withColumn("w", greatest(lit(1L), lit(10L) - col("n_both")))
    val und = e0.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionAll(e0.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
      .localCheckpoint(true)
    var dist = und.select(col("src").as("node")).distinct()
      .filter(col("node") % 100 === 0)
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    (1 to 3).foreach { _ =>
      val relaxed = dist.join(und, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"),
           sum(col("node")).cast("long").as("id_checksum"))
      .orderBy("dist")
  }
  private val gSsspSql = {
    val rounds = (1 to 3).map { r =>
      s"""d$r AS (SELECT node, MIN(dist) AS dist FROM (
         |  SELECT node, dist FROM d${r - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, d${r - 1}.dist + e.w AS dist
         |  FROM d${r - 1} JOIN e ON e.src = d${r - 1}.node) u
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
       |        greatest(1, 10 - COUNT(*)) AS w
       |      FROM op a JOIN op b USING (l_orderkey)
       |      WHERE a.l_partkey < b.l_partkey
       |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS (SELECT pa AS src, pb AS dst, w FROM p
       |      UNION ALL SELECT pb, pa, w FROM p),
       |d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
       |       FROM e WHERE src % 100 = 0),
       |$rounds
       |SELECT dist, COUNT(*) AS n_nodes,
       |CAST(SUM(node) AS BIGINT) AS id_checksum
       |FROM d3 GROUP BY 1 ORDER BY dist""".stripMargin
  }

  // ------------------------------------------------------------------
  // a28_cramers_v — association strength between two categoricals
  // (order status × order priority): χ² over the contingency table with
  // expected counts from the marginals, V = sqrt(χ² / (N·min(r−1,
  // c−1))). One groupBy builds the cells; marginals come from window-
  // free re-aggregation of the cells (the table is domain-bounded:
  // |flags|·|modes| rows). Each cell's χ² term is ONE double
  // expression rounded to 6 and summed as DECIMAL — order-free — and
  // V is one final double, round-6.
  // ------------------------------------------------------------------
  private val a28CramersV: QFn = (s, dir) => {
    val cells = t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("f"), col("o_orderpriority").as("m"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("f").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("m").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"), countDistinct(col("f")).as("r"),
      countDistinct(col("m")).as("c"))
    val term = round(
      pow(col("o").cast("double") -
          col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double"), 2) /
        (col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double")), 6)
    cells.join(broadcast(rowTot), "f").join(broadcast(colTot), "m")
      .crossJoin(broadcast(n))
      .select(col("n"), col("r"), col("c"),
        term.cast(DecimalType(18, 6)).as("term"))
      .groupBy("n", "r", "c")
      .agg(sum("term").as("chi2d"))
      .select(
        col("n").as("n_rows"),
        round(col("chi2d").cast("double"), 6).as("chi2"),
        round(sqrt(col("chi2d").cast("double") /
          (col("n").cast("double") *
            least(col("r") - 1, col("c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }
  private val a28Sql =
    """WITH cells AS (SELECT o_orderstatus AS f, o_orderpriority AS m,
      |    COUNT(*) AS o FROM orders GROUP BY 1, 2),
      |rt AS (SELECT f, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT m, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |       COUNT(DISTINCT f) AS r, COUNT(DISTINCT m) AS c FROM cells),
      |terms AS (SELECT n, r, c,
      |  CAST(round(
      |    pow(CAST(o AS DOUBLE)
      |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 2)
      |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)),
      |    6) AS DECIMAL(18,6)) AS term
      |  FROM cells JOIN rt USING (f) JOIN ct USING (m) CROSS JOIN nn)
      |SELECT n AS n_rows,
      |round(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
      |round(sqrt(CAST(SUM(term) AS DOUBLE)
      |  / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)
      |  AS cramers_v
      |FROM terms GROUP BY n, r, c""".stripMargin

  val queries: Map[String, QFn] = Map(
    "p_weighted_sample" -> pWeightedSample,
    "t_tfidf_topterms" -> tTfidfTop,
    "g_sssp_hubs" -> gSsspHubs,
    "a28_cramers_v" -> a28CramersV)

  val oracleSql: Map[String, String] = Map(
    "p_weighted_sample" -> pWeightedSampleSql,
    "t_tfidf_topterms" -> tTfidfTopSql,
    "g_sssp_hubs" -> gSsspSql,
    "a28_cramers_v" -> a28Sql)
}
