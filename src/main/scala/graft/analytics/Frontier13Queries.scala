package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening: machine-translation-style BLEU pair scoring (the
  * precision-side complement to Frontier8's recall-oriented ROUGE),
  * the unbiased pass@k estimator every code/eval harness reports
  * (Chen et al. 2021 "Evaluating LLMs Trained on Code", eq. 1 —
  * public formula), and neighbor-set Jaccard link prediction (the
  * set-overlap complement to Frontier7's Adamic–Adar).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL(18,6) before any reordering sum, total ORDER BYs.
  */
object Frontier13Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // t_bleu_pairs — BLEU-2 (geometric mean of modified 1-gram and
  // 2-gram precision × brevity penalty) between same-language
  // (candidate=doc_id, reference=doc_id+1) pairs — the deterministic
  // join-derived pairing Frontier8 uses, so the two generation-eval
  // metrics grade the identical pair set. Clipped n-gram matches are
  // Σ min(count_cand, count_ref) via an inner join on (pair, gram):
  // everything shuffles on pair/gram keys only — the evaluation
  // scales to any corpus of (candidate, reference) pairs. Per-pair
  // BLEU is ONE rounded double — BP · sqrt(p1·p2), with
  // BP = exp(1 − len_ref/len_cand) when the candidate is shorter —
  // frozen as DECIMAL(18,6) so the per-language mean is an exact
  // decimal sum ÷ count. Pairs with zero 1-gram or 2-gram overlap
  // (or a 1-token candidate, which has no bigrams) score 0, exactly
  // as an un-smoothed corpus BLEU harness scores them.
  // ------------------------------------------------------------------
  private val tBleuPairs: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        split(TF.normText(col("text")), " ").as("toks"))
    val pairs = docs.select(col("doc_id").as("pa"), col("lang"))
      .join(docs.select((col("doc_id") - 1).as("pa"),
        col("lang").as("lang_b"), col("doc_id").as("pb")), "pa")
      .filter(col("lang") === col("lang_b"))
      .select(col("pa"), col("pb"), col("lang"))
      .localCheckpoint(true)
    def grams(n: Int): DataFrame = {
      val base = docs.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
      val g =
        if (n == 1) base.select(col("doc_id"), col("w").as("gram"))
        else {
          val wNext = Window.partitionBy("doc_id").orderBy("pos")
          base.withColumn("w2", lead(col("w"), 1).over(wNext))
            .filter(col("w2").isNotNull)
            .select(col("doc_id"), concat_ws(" ", col("w"), col("w2"))
              .as("gram"))
        }
      g.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    }
    def overlap(gc: DataFrame, name: String): DataFrame = pairs
      .join(gc.select(col("doc_id").as("pa"), col("gram"),
        col("c").as("ca")), "pa")
      .join(gc.select(col("doc_id").as("pb"), col("gram"),
        col("c").as("cb")), Seq("pb", "gram"))
      .groupBy("pa", "pb").agg(sum(least(col("ca"), col("cb"))).as(name))
    val g1 = grams(1).localCheckpoint(true)
    val g2 = grams(2).localCheckpoint(true)
    def lens(gc: DataFrame, name: String): DataFrame =
      gc.groupBy("doc_id").agg(sum("c").as(name))
    val scored = pairs
      .join(overlap(g1, "ov1"), Seq("pa", "pb"), "left")
      .join(overlap(g2, "ov2"), Seq("pa", "pb"), "left")
      .join(lens(g1, "la1").select(col("doc_id").as("pa"), col("la1")), "pa")
      .join(lens(g1, "lb1").select(col("doc_id").as("pb"), col("lb1")), "pb")
      .join(lens(g2, "la2").select(col("doc_id").as("pa"), col("la2")),
        Seq("pa"), "left")
      .select(col("lang"),
        coalesce(
          when(col("ov1") > 0 && col("ov2") > 0,
            round(
              when(col("la1") >= col("lb1"), lit(1.0))
                .otherwise(exp(lit(1.0) -
                  col("lb1").cast("double") / col("la1").cast("double"))) *
              sqrt((col("ov1").cast("double") / col("la1").cast("double")) *
                   (col("ov2").cast("double") / col("la2").cast("double"))),
              6)),
          lit(0.0)).cast(DecimalType(18, 6)).as("bleu"))
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"), sum(col("bleu")).as("sb"))
      .select(col("lang"), col("n_pairs"),
        round(col("sb").cast("double") / col("n_pairs").cast("double"), 6)
          .as("bleu2_r"))
      .orderBy("lang")
  }
  private val tBleuPairsSql = {
    val norm = TF.normTextSql("text")
    s"""WITH docs AS (SELECT doc_id, lang,
       |    string_split($norm, ' ') AS toks
       |  FROM documents),
       |pairs AS (SELECT a.doc_id AS pa, b.doc_id AS pb, a.lang
       |  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
       |   AND b.lang = a.lang),
       |w0 AS (SELECT doc_id, unnest(toks) AS w,
       |    generate_subscripts(toks, 1) AS pos
       |  FROM docs),
       |w AS (SELECT doc_id, w, pos FROM w0 WHERE length(w) > 0),
       |g1 AS (SELECT doc_id, w AS gram, COUNT(*) AS c
       |       FROM w GROUP BY 1, 2),
       |b0 AS (SELECT doc_id, w,
       |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM w),
       |g2 AS (SELECT doc_id, w || ' ' || w2 AS gram, COUNT(*) AS c
       |       FROM b0 WHERE w2 IS NOT NULL GROUP BY 1, 2),
       |l1 AS (SELECT doc_id, SUM(c) AS len FROM g1 GROUP BY 1),
       |l2 AS (SELECT doc_id, SUM(c) AS len FROM g2 GROUP BY 1),
       |i1 AS (SELECT p.pa, p.pb, SUM(least(a.c, b.c)) AS ov
       |  FROM pairs p JOIN g1 a ON a.doc_id = p.pa
       |  JOIN g1 b ON b.doc_id = p.pb AND b.gram = a.gram
       |  GROUP BY 1, 2),
       |i2 AS (SELECT p.pa, p.pb, SUM(least(a.c, b.c)) AS ov
       |  FROM pairs p JOIN g2 a ON a.doc_id = p.pa
       |  JOIN g2 b ON b.doc_id = p.pb AND b.gram = a.gram
       |  GROUP BY 1, 2),
       |pf AS (SELECT p.lang,
       |    CAST(COALESCE(CASE WHEN i1.ov > 0 AND i2.ov > 0 THEN
       |      round((CASE WHEN la1.len >= lb1.len THEN 1.0
       |        ELSE exp(1.0 - CAST(lb1.len AS DOUBLE)
       |          / CAST(la1.len AS DOUBLE)) END)
       |        * sqrt((CAST(i1.ov AS DOUBLE) / CAST(la1.len AS DOUBLE))
       |          * (CAST(i2.ov AS DOUBLE) / CAST(la2.len AS DOUBLE))), 6)
       |      END, 0.0) AS DECIMAL(18,6)) AS bleu
       |  FROM pairs p
       |  LEFT JOIN i1 ON i1.pa = p.pa AND i1.pb = p.pb
       |  LEFT JOIN i2 ON i2.pa = p.pa AND i2.pb = p.pb
       |  JOIN l1 la1 ON la1.doc_id = p.pa
       |  JOIN l1 lb1 ON lb1.doc_id = p.pb
       |  LEFT JOIN l2 la2 ON la2.doc_id = p.pa)
       |SELECT lang, COUNT(*) AS n_pairs,
       |  round(CAST(SUM(bleu) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS bleu2_r
       |FROM pf GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // eval_pass_at_k — the unbiased pass@k estimator over grouped
  // attempt outcomes: each user is a "problem", each event an
  // "attempt", purchase = success; pass@k = 1 − C(n−c,k)/C(n,k),
  // computed as the EXACT integer falling-factorial ratio
  // Π_{i<k}(n−c−i) / Π_{i<k}(n−i) (k ∈ {1,3,5} unrolled, so both
  // engines evaluate the identical product — BIGINT-exact while
  // n^5 < 2^63, i.e. n ≤ ~4000 attempts per problem; beyond that the
  // products widen to DECIMAL(38,0) unchanged). The per-problem
  // estimate is ONE rounded double frozen as DECIMAL(18,6); the
  // per-k mean over problems is exact-decimal-sum ÷ count. One
  // groupBy on user_id then a 3-way unioned scan of the TINY
  // (problem, n, c) aggregate — the raw attempt table shuffles once
  // regardless of how many k values are reported.
  // ------------------------------------------------------------------
  private val evalPassAtK: QFn = (s, dir) => {
    val probs = t(s, dir, "events")
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("ok"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("c"))
      .localCheckpoint(true)
    def branch(k: Int): DataFrame = {
      val num = (0 until k).map(i => col("n") - col("c") - lit(i.toLong))
        .reduce(_ * _)
      val den = (0 until k).map(i => col("n") - lit(i.toLong))
        .reduce(_ * _)
      probs.filter(col("n") >= k)
        .select(lit(k).as("k"), col("user_id"), col("c"),
          round(lit(1.0) -
            when(col("n") - col("c") >= k, num).otherwise(lit(0L))
              .cast("double") / den.cast("double"), 6)
            .cast(DecimalType(18, 6)).as("p"))
    }
    branch(1).unionByName(branch(3)).unionByName(branch(5))
      .groupBy("k")
      .agg(count(lit(1)).as("n_problems"),
        sum(col("c")).cast("long").as("total_successes"),
        sum(col("p")).as("sp"))
      .select(col("k"), col("n_problems"), col("total_successes"),
        round(col("sp").cast("double") / col("n_problems").cast("double"), 6)
          .as("mean_pass_r"))
      .orderBy("k")
  }
  private val evalPassAtKSql = {
    def branch(k: Int): String = {
      val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
      s"""SELECT $k AS k, user_id, c,
         |  CAST(round(1.0 - CAST(CASE WHEN n - c >= $k THEN $num
         |      ELSE 0 END AS DOUBLE) / CAST($den AS DOUBLE), 6)
         |    AS DECIMAL(18,6)) AS p
         |FROM probs WHERE n >= $k""".stripMargin
    }
    s"""WITH probs AS (SELECT user_id, COUNT(*) AS n,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
       |  FROM events GROUP BY 1),
       |b AS (${branch(1)} UNION ALL ${branch(3)} UNION ALL ${branch(5)})
       |SELECT k, COUNT(*) AS n_problems,
       |  CAST(SUM(c) AS BIGINT) AS total_successes,
       |  round(CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS mean_pass_r
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // g_jaccard_neighbors — neighbor-set Jaccard link prediction over
  // the same co-purchase graph as g_adamic_adar (parts linked when
  // ≥2 shared orders): score(a,b) = |N(a)∩N(b)| / (|N(a)|+|N(b)|−∩)
  // for pairs NOT already linked. Degrees come from the FULL graph;
  // the wedge join runs on per-node top-30 neighbor lists (the hub-
  // bounding discipline that caps fan-out at 30² per center at any
  // scale — both engines replay the identical cap, so the estimate
  // is deterministic). Existing edges leave via one anti-join; the
  // top-20 pairs come from the two-phase rankTopK (no global sort).
  // ------------------------------------------------------------------
  private val gJaccardNeighbors: QFn = (s, dir) => {
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
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val capped = e
      .withColumn("rn", row_number().over(Window.partitionBy("src")
        .orderBy(col("n_both").desc, col("dst"))))
      .filter(col("rn") <= 30)
      .select(col("src"), col("dst"))
    val common = capped.select(col("src").as("w"), col("dst").as("x"))
      .join(capped.select(col("src").as("w"), col("dst").as("y")), "w")
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_common"))
    val scored = common
      .join(broadcast(deg.select(col("src").as("x"), col("deg").as("dx"))),
        "x")
      .join(broadcast(deg.select(col("src").as("y"), col("deg").as("dy"))),
        "y")
      .join(e0.select(col("pa").as("x"), col("pb").as("y")),
        Seq("x", "y"), "left_anti")
      .select(col("x").as("pa"), col("y").as("pb"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("dx") + col("dy") - col("n_common")).cast("double"), 6)
          .as("jac_r"))
    graft.operators.TopK.rankTopK(scored, 20,
        Seq(col("jac_r").desc, col("pa").asc, col("pb").asc), "rnk")
      .select(col("rnk"), col("pa"), col("pb"), col("n_common"),
        col("jac_r"))
      .orderBy("rnk")
  }
  private val gJaccardNeighborsSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
      |         COUNT(*) AS n_both
      |       FROM op a JOIN op b USING (l_orderkey)
      |       WHERE a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT pa AS src, pb AS dst, n_both FROM e0
      |      UNION ALL SELECT pb, pa, n_both FROM e0),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
      |capped AS (SELECT src, dst FROM e
      |  QUALIFY row_number() OVER (PARTITION BY src
      |    ORDER BY n_both DESC, dst) <= 30),
      |com AS (SELECT cx.dst AS x, cy.dst AS y, COUNT(*) AS n_common
      |  FROM capped cx JOIN capped cy ON cx.src = cy.src
      |  WHERE cx.dst < cy.dst GROUP BY 1, 2),
      |nf AS (SELECT com.x AS pa, com.y AS pb, com.n_common,
      |    round(CAST(com.n_common AS DOUBLE)
      |      / CAST(dx.deg + dy.deg - com.n_common AS DOUBLE), 6) AS jac_r
      |  FROM com JOIN deg dx ON dx.src = com.x
      |  JOIN deg dy ON dy.src = com.y
      |  WHERE NOT EXISTS (SELECT 1 FROM e0
      |    WHERE e0.pa = com.x AND e0.pb = com.y))
      |SELECT CAST(rank() OVER (ORDER BY jac_r DESC, pa, pb) AS INT)
      |    AS rnk,
      |  pa, pb, n_common, jac_r
      |FROM nf
      |QUALIFY rnk <= 20
      |ORDER BY rnk""".stripMargin

  val queries: Map[String, QFn] = Map(
    "t_bleu_pairs" -> tBleuPairs,
    "eval_pass_at_k" -> evalPassAtK,
    "g_jaccard_neighbors" -> gJaccardNeighbors)

  val oracleSql: Map[String, String] = Map(
    "t_bleu_pairs" -> tBleuPairsSql,
    "eval_pass_at_k" -> evalPassAtKSql,
    "g_jaccard_neighbors" -> gJaccardNeighborsSql)
}
