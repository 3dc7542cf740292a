package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 eighth-session widening: unsupervised clustering (Lloyd's
  * k-means over the embedding corpus, fully distributed and exactly
  * deterministic) and a multinomial Naive Bayes text classifier
  * (train + score + confusion matrix in one query) — the two ML
  * primitives an LLM data pipeline leans on for semantic corpus
  * bucketing and fastText-style quality/domain classification.
  *
  * Both entries keep EVERY intermediate in exact integer/decimal
  * arithmetic (coordinates and log-likelihoods are rounded once and
  * frozen as DECIMAL(18,6)), so cluster assignments and argmax
  * predictions are bit-reproducible across engines and partitionings
  * — no floating-point accumulation order anywhere.
  */
object Frontier4Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // ml_kmeans_embed — Lloyd's k-means (k = 8, 3 update rounds) over
  // the 64-dim embedding table in long (vec_id, dim, value) layout:
  // assignment is one join on the dim key against the 512-row
  // broadcast centroid table + a groupBy(vec, cluster) for distances
  // + a partitioned argmin window; the update is one
  // groupBy(cluster, dim) mean. Nothing ever shuffles on anything
  // but (vec_id | dim | cid) keys, partial aggregation runs map-side,
  // and the per-round driver loop is a fixed 3 iterations — the
  // classic scalable k-means shape (distances could fuse into a
  // dot-product form, but the explicit long layout keeps every
  // intermediate exact). Determinism: coordinates are frozen as
  // round-6 DECIMAL on load, so squared distances are EXACT decimals
  // (diffs clamped to DECIMAL(12,6) to keep both engines inside
  // decimal width limits), argmin ties break on cid, seeds are the 8
  // smallest md5(vec_id) picked by the two-phase TopK operator, and
  // centroid means re-freeze to round-6 DECIMAL each round. Empty
  // clusters drop (standard Lloyd behavior), identically in both
  // engines. Output: per-cluster size, inertia, and centroid norm.
  // ------------------------------------------------------------------
  private val mlKmeansEmbed: QFn = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val pts = graft.ml.KMeans.pointsLong(emb).localCheckpoint(true)
    val cent = graft.ml.KMeans.fit(emb, pts, k = 8, iters = 3)
    val finalAsg = graft.ml.KMeans.assign(pts, cent)
    val cnorm = cent
      .withColumn("c6", col("cd").cast(DecimalType(12, 6)))
      .groupBy("cid").agg(sum(col("c6") * col("c6")).as("nrm"))
      .select(col("cid"), round(col("nrm").cast("double"), 6).as("cnorm_r"))
    finalAsg.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("d2")).cast("double"), 6).as("inertia_r"))
      .join(broadcast(cnorm), "cid")
      .select(col("cid"), col("n_vecs"), col("inertia_r"), col("cnorm_r"))
      .orderBy("cid")
  }
  private val mlKmeansEmbedSql = {
    s"""WITH ${graft.ml.KMeans.sqlCtes(dim = 64, k = 8, iters = 3)},
       |cn AS (SELECT cid,
       |    round(CAST(CAST(SUM(CAST(cd AS DECIMAL(12,6))
       |      * CAST(cd AS DECIMAL(12,6))) AS VARCHAR) AS DOUBLE), 6)
       |    AS cnorm_r
       |  FROM c3 GROUP BY 1)
       |SELECT a4.cid, COUNT(*) AS n_vecs,
       |  round(CAST(CAST(SUM(a4.d2) AS VARCHAR) AS DOUBLE), 6) AS inertia_r,
       |  cn.cnorm_r
       |FROM a4 JOIN cn USING (cid)
       |GROUP BY a4.cid, cn.cnorm_r
       |ORDER BY a4.cid""".stripMargin
  }

  // ------------------------------------------------------------------
  // t_nb_classify — multinomial Naive Bayes language classifier with
  // add-one smoothing, trained on the 80% md5 split (p_hash_split's
  // exact bucketing) and scored on the 20% holdout; output is the
  // confusion matrix. Per-class per-term log-likelihoods
  // ln((tc+1)/(tot_c+V)) and priors ln(n_c/N) are each ONE double
  // over exact counts, rounded to 6 and frozen as DECIMAL(18,6), so
  // a document's class score — prior + Σ token log-liks — is an
  // EXACT decimal sum (order-free) and the argmax is
  // engine-independent (ties break on class name). The plan: two
  // token-level groupBys for the model (term-key shuffles with
  // map-side combine), a 5-way token × class expansion joined to the
  // broadcast-sized model on the term key, and one doc-key groupBy —
  // the fastText-style quality/domain-classifier shape at corpus
  // scale. Unseen terms fall back to the class's smoothed floor via
  // coalesce against the broadcast per-class default.
  // ------------------------------------------------------------------
  private val tNbClassify: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        split(TF.normText(col("text")), " ").as("toks"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
    val train = docs.filter(col("bucket") < 80)
    val test = docs.filter(col("bucket") >= 80)
    val tokTr = train.select(col("lang"), explode(col("toks")).as("term"))
      .filter(length(col("term")) > 0)
    val tokTe = test
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(length(col("term")) > 0)
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val vocab = tokTr.agg(countDistinct(col("term")).as("v"))
    val classes = train.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(tokTr.groupBy("lang").agg(count(lit(1)).as("tot")), "lang")
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(vocab))
      .select(col("lang").as("c"), col("tot"), col("v"),
        round(log(col("n_docs").cast("double") /
          col("n_train").cast("double")), 6).cast(DecimalType(18, 6))
          .as("prior_r"),
        round(log(lit(1.0) / (col("tot") + col("v")).cast("double")), 6)
          .cast(DecimalType(18, 6)).as("def_r"))
    val ll = tokTr.groupBy(col("lang").as("c"), col("term"))
      .agg(count(lit(1)).as("tc"))
      .join(broadcast(classes.select("c", "tot", "v")), "c")
      .select(col("c"), col("term"),
        round(log((col("tc") + 1).cast("double") /
          (col("tot") + col("v")).cast("double")), 6)
          .cast(DecimalType(18, 6)).as("ll_r"))
    val tokScores = tokTe
      .crossJoin(broadcast(classes.select("c", "def_r")))
      .join(ll, Seq("term", "c"), "left")
      .select(col("doc_id"), col("c"),
        coalesce(col("ll_r"), col("def_r")).as("l"))
      .groupBy("doc_id", "c")
      .agg(sum(col("l")).cast(DecimalType(28, 6)).as("toksum"))
    val pred = test.select(col("doc_id"), col("lang").as("true_lang"))
      .crossJoin(broadcast(classes.select("c", "prior_r")))
      .join(tokScores, Seq("doc_id", "c"), "left")
      .withColumn("score", col("prior_r") +
        coalesce(col("toksum"), lit(0).cast(DecimalType(28, 6))))
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("c").asc)))
      .filter(col("rn") === 1)
    pred.groupBy(col("true_lang"), col("c").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
  }
  private val tNbClassifySql = {
    val norm = TF.normTextSql("text")
    s"""WITH docs AS (SELECT doc_id, lang, $norm AS nt,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 100 AS bucket
       |  FROM documents),
       |train AS (SELECT * FROM docs WHERE bucket < 80),
       |test AS (SELECT * FROM docs WHERE bucket >= 80),
       |tok_tr0 AS (SELECT lang, unnest(string_split(nt, ' ')) AS term
       |            FROM train),
       |tok_tr AS (SELECT lang, term FROM tok_tr0 WHERE length(term) > 0),
       |tok_te0 AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term
       |            FROM test),
       |tok_te AS (SELECT doc_id, term FROM tok_te0 WHERE length(term) > 0),
       |nt AS (SELECT COUNT(*) AS n_train FROM train),
       |vb AS (SELECT COUNT(DISTINCT term) AS v FROM tok_tr),
       |cls AS (SELECT d.lang AS c, t.tot, vb.v,
       |    CAST(round(ln(CAST(d.n_docs AS DOUBLE)
       |      / CAST(nt.n_train AS DOUBLE)), 6) AS DECIMAL(18,6)) AS prior_r,
       |    CAST(round(ln(1.0 / CAST(t.tot + vb.v AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS def_r
       |  FROM (SELECT lang, COUNT(*) AS n_docs FROM train GROUP BY 1) d
       |  JOIN (SELECT lang, COUNT(*) AS tot FROM tok_tr GROUP BY 1) t
       |    USING (lang) CROSS JOIN nt CROSS JOIN vb),
       |ll AS (SELECT tc.c, tc.term,
       |    CAST(round(ln(CAST(tc.tc + 1 AS DOUBLE)
       |      / CAST(cls.tot + cls.v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS ll_r
       |  FROM (SELECT lang AS c, term, COUNT(*) AS tc FROM tok_tr
       |        GROUP BY 1, 2) tc
       |  JOIN cls USING (c)),
       |ts AS (SELECT te.doc_id, cl.c,
       |    CAST(SUM(COALESCE(ll.ll_r, cl.def_r)) AS DECIMAL(28,6)) AS toksum
       |  FROM tok_te te CROSS JOIN cls cl
       |  LEFT JOIN ll ON ll.term = te.term AND ll.c = cl.c
       |  GROUP BY 1, 2),
       |sc AS (SELECT t.doc_id, t.lang AS true_lang, cl.c,
       |    cl.prior_r + COALESCE(ts.toksum, CAST(0 AS DECIMAL(28,6)))
       |      AS score
       |  FROM test t CROSS JOIN cls cl
       |  LEFT JOIN ts ON ts.doc_id = t.doc_id AND ts.c = cl.c),
       |pr AS (SELECT doc_id, true_lang, c FROM sc
       |  QUALIFY row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, c) = 1)
       |SELECT true_lang, c AS pred_lang, COUNT(*) AS n_docs
       |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "ml_kmeans_embed" -> mlKmeansEmbed,
    "t_nb_classify" -> tNbClassify)

  val oracleSql: Map[String, String] = Map(
    "ml_kmeans_embed" -> mlKmeansEmbedSql,
    "t_nb_classify" -> tNbClassifySql)
}
