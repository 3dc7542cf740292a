package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, fourth pack: SCD Type 4 (the current+history
  * twin-table pattern that completes the SCD1/2/3 family the etl
  * package already covers), Markov-chain steady-state via power
  * iteration on the global event-transition matrix (the stationary
  * distribution behind "where do user journeys settle"), and RAKE
  * keyphrase extraction (Rose et al. 2010 — degree/frequency word
  * scoring over stopword-delimited phrases; the classic unsupervised
  * keyword pass a curation pipeline runs per corpus).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL(18,6) before any reordering sum, total ORDER BYs.
  */
object Frontier16Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // i24_scd4 — Type-4 slowly changing dimension: the customer's
  // priority timeline (consecutive-duplicate-collapsed runs of
  // o_orderpriority along order date) splits into a CURRENT table
  // (latest run only — the hot lookup set) and a HISTORY table
  // (every superseded run with its [valid_from, valid_to) interval).
  // Run detection is one lag()+cumulative-sum islands pass per
  // customer partition; interval close-out is one lead() over the
  // run table — both scale with the customer axis, nothing global.
  // The union carries a tbl discriminator so the driver checks both
  // tables in one result; history rows alone reconstruct every
  // intermediate state, current rows alone serve point lookups —
  // exactly the Type-4 trade (Kimball ch. 5) of fast current reads
  // against a separately-growing history store.
  // ------------------------------------------------------------------
  private val i24Scd4: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
    val wSeq = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    val runs = o
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(wSeq))
      .withColumn("brk",
        when(col("prev").isNull ||
          col("prev") =!= col("o_orderpriority"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("o_custkey", "run_id")
      .agg(min(col("o_orderpriority")).as("priority"),
        min(col("d")).as("valid_from"))
    val wRun = Window.partitionBy("o_custkey").orderBy("run_id")
    val closed = runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
    closed.filter(col("valid_to").isNotNull)
      .select(lit("history").as("tbl"), col("o_custkey"),
        col("priority"), col("valid_from"), col("valid_to"))
      .unionByName(closed.filter(col("valid_to").isNull)
        .select(lit("current").as("tbl"), col("o_custkey"),
          col("priority"), col("valid_from"),
          lit("9999-12-31").cast("date").as("valid_to")))
      .orderBy("o_custkey", "valid_from", "tbl")
  }
  private val i24Scd4Sql =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS d, o_orderpriority
      |  FROM orders),
      |rb AS (SELECT o_custkey, d, o_orderkey, o_orderpriority,
      |    CASE WHEN lag(o_orderpriority) OVER ws IS NULL
      |      OR lag(o_orderpriority) OVER ws <> o_orderpriority
      |    THEN 1 ELSE 0 END AS brk
      |  FROM o WINDOW ws AS (PARTITION BY o_custkey
      |    ORDER BY d, o_orderkey)),
      |ri AS (SELECT o_custkey, d, o_orderpriority,
      |    SUM(brk) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM rb),
      |runs AS (SELECT o_custkey, run_id,
      |    MIN(o_orderpriority) AS priority, MIN(d) AS valid_from
      |  FROM ri GROUP BY 1, 2),
      |closed AS (SELECT o_custkey, priority, valid_from,
      |    lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id)
      |      AS valid_to
      |  FROM runs)
      |SELECT 'history' AS tbl, o_custkey, priority, valid_from, valid_to
      |FROM closed WHERE valid_to IS NOT NULL
      |UNION ALL
      |SELECT 'current', o_custkey, priority, valid_from,
      |  CAST('9999-12-31' AS DATE)
      |FROM closed WHERE valid_to IS NULL
      |ORDER BY o_custkey, valid_from, tbl""".stripMargin

  // ------------------------------------------------------------------
  // ev_markov_steady — stationary behavior of the GLOBAL event-type
  // Markov chain: transition probabilities p(a→b) = n_ab/n_a from all
  // per-user consecutive event pairs (one lead() per user partition +
  // one (a,b) groupBy — the 5×5 matrix is data-scale-invariant), then
  // three power-iteration steps π ← πP from the uniform start. Every
  // p and every π entry is ONE rounded double frozen as DECIMAL(18,6),
  // and each iteration's 5-term dot products are exact decimal sums —
  // so both engines walk the identical float path. Emits π after each
  // iteration (pi1..pi3) so convergence is visible; at 100 TB only
  // the transition-count pass touches data, the iteration runs on a
  // constant-size matrix.
  // ------------------------------------------------------------------
  private val evMarkovSteady: QFn = (s, dir) => {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val trans = e.withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("nab"))
    val na = trans.groupBy("a").agg(sum("nab").as("na"))
    val p = trans.join(na, "a")
      .select(col("a"), col("b"),
        round(col("nab").cast("double") / col("na").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("p"))
      .localCheckpoint(true)
    val states = p.select(col("a").as("st")).distinct()
    val nStates = states.count() // 5 event types — constant-size matrix
    val pi0 = states.select(col("st"),
      round(lit(1.0) / lit(nStates.toDouble), 6)
        .cast(DecimalType(18, 6)).as("pi"))
    def step(pi: DataFrame): DataFrame = p
      .join(pi.select(col("st").as("a"), col("pi").as("pa")), "a")
      .select(col("b"), (col("pa") * col("p")).as("term"))
      .groupBy(col("b")).agg(sum(col("term")).as("s"))
      .select(col("b").as("st"),
        round(col("s").cast("double"), 6).cast(DecimalType(18, 6)).as("pi"))
    val pi1 = step(pi0).localCheckpoint(true)
    val pi2 = step(pi1).localCheckpoint(true)
    val pi3 = step(pi2)
    pi1.select(col("st"), col("pi").as("pi1"))
      .join(pi2.select(col("st"), col("pi").as("pi2")), "st")
      .join(pi3.select(col("st"), col("pi").as("pi3")), "st")
      .select(col("st").as("event_type"),
        col("pi1").cast("string").as("pi1"),
        col("pi2").cast("string").as("pi2"),
        col("pi3").cast("string").as("pi3"))
      .orderBy("event_type")
  }
  private val evMarkovSteadySql =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) // 1000000 AS sec
      |  FROM events),
      |tr AS (SELECT user_id, event_type AS a,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY sec, event_id) AS b
      |  FROM e),
      |trn AS (SELECT a, b, COUNT(*) AS nab FROM tr
      |        WHERE b IS NOT NULL GROUP BY 1, 2),
      |na AS (SELECT a, SUM(nab) AS na FROM trn GROUP BY 1),
      |p AS (SELECT trn.a, trn.b,
      |    CAST(round(CAST(trn.nab AS DOUBLE) / CAST(na.na AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS p
      |  FROM trn JOIN na ON na.a = trn.a),
      |states AS (SELECT DISTINCT a AS st FROM p),
      |pi0 AS (SELECT st,
      |    CAST(round(1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM states),
      |      6) AS DECIMAL(18,6)) AS pi
      |  FROM states),
      |pi1 AS (SELECT p.b AS st,
      |    CAST(round(CAST(SUM(pi0.pi * p.p) AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS pi
      |  FROM p JOIN pi0 ON pi0.st = p.a GROUP BY 1),
      |pi2 AS (SELECT p.b AS st,
      |    CAST(round(CAST(SUM(pi1.pi * p.p) AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS pi
      |  FROM p JOIN pi1 ON pi1.st = p.a GROUP BY 1),
      |pi3 AS (SELECT p.b AS st,
      |    CAST(round(CAST(SUM(pi2.pi * p.p) AS DOUBLE), 6)
      |      AS DECIMAL(18,6)) AS pi
      |  FROM p JOIN pi2 ON pi2.st = p.a GROUP BY 1)
      |SELECT pi1.st AS event_type,
      |  CAST(pi1.pi AS VARCHAR) AS pi1,
      |  CAST(pi2.pi AS VARCHAR) AS pi2,
      |  CAST(pi3.pi AS VARCHAR) AS pi3
      |FROM pi1 JOIN pi2 ON pi2.st = pi1.st JOIN pi3 ON pi3.st = pi1.st
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // t_keyphrase_rake — RAKE keyphrase extraction over the corpus:
  // phrases are maximal runs of non-stopword tokens (the normalized
  // text has punctuation folded to spaces, so stopwords are the only
  // delimiters — the standard RAKE adaptation for pre-normalized
  // input); each word scores deg/freq where freq counts its phrase
  // occurrences and deg sums the lengths of the phrases it sits in
  // (co-occurrence including self, Rose et al. §1.2.1); a phrase
  // scores the sum of its words' frozen DECIMAL(18,6) scores. The
  // phrase inventory shuffles on (doc, island) then on phrase text —
  // corpus-linear, no all-pairs anywhere. Top-15 phrases of length
  // ≥2 via the two-phase rankTopK (no global sort).
  // ------------------------------------------------------------------
  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in",
    "is", "it", "that", "as", "for", "on", "with", "was", "by", "at")

  private val tKeyphraseRake: QFn = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(TF.normText(col("text")), " "))
          .as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("stop", col("w").isInCollection(stopwords))
    val wSeq = Window.partitionBy("doc_id").orderBy("pos")
    val isl = toks
      .withColumn("isl", sum(when(col("stop"), 1L).otherwise(0L)).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col("stop"))
    val phraseToks = isl.select(col("doc_id"), col("isl"), col("pos"),
      col("w")).localCheckpoint(true)
    val phrases = phraseToks.groupBy("doc_id", "isl")
      .agg(count(lit(1)).as("len"),
        array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("w")))), x => x.getField("w")), " ").as("phrase"))
    val wordStats = phraseToks
      .join(phrases.select(col("doc_id"), col("isl"), col("len")),
        Seq("doc_id", "isl"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") / col("freq").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("wscore"))
    val phraseScores = phraseToks.join(wordStats, "w")
      .groupBy("doc_id", "isl")
      .agg(sum(col("wscore")).as("pscore"))
    val byText = phrases.join(phraseScores, Seq("doc_id", "isl"))
      .filter(col("len") >= 2)
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"), max(col("len")).as("len"),
        max(col("pscore")).as("ps"))
      .select(col("phrase"), col("n_occurrences"), col("len"),
        round(col("ps").cast("double"), 4).as("score_r"))
    graft.operators.TopK.rankTopK(byText, 15,
        Seq(col("score_r").desc, col("phrase").asc), "rnk")
      .select(col("rnk"), col("phrase"), col("n_occurrences"), col("len"),
        col("score_r"))
      .orderBy("rnk")
  }
  private val tKeyphraseRakeSql = {
    val norm = TF.normTextSql("text")
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (SELECT doc_id, string_split($norm, ' ') AS toks
       |  FROM documents),
       |w0 AS (SELECT doc_id, unnest(toks) AS w,
       |    generate_subscripts(toks, 1) AS pos
       |  FROM docs),
       |tk AS (SELECT doc_id, pos, w, w IN ($stopList) AS stop
       |  FROM w0 WHERE length(w) > 0),
       |isl0 AS (SELECT doc_id, pos, w, stop,
       |    SUM(CASE WHEN stop THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       |  FROM tk),
       |pt AS (SELECT doc_id, isl, pos, w FROM isl0 WHERE NOT stop),
       |ph AS (SELECT doc_id, isl, COUNT(*) AS len,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase
       |  FROM pt GROUP BY 1, 2),
       |ws AS (SELECT pt.w,
       |    CAST(round(CAST(SUM(ph.len) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS wscore
       |  FROM pt JOIN ph ON ph.doc_id = pt.doc_id AND ph.isl = pt.isl
       |  GROUP BY 1),
       |psc AS (SELECT pt.doc_id, pt.isl, SUM(ws.wscore) AS pscore
       |  FROM pt JOIN ws ON ws.w = pt.w GROUP BY 1, 2),
       |bt AS (SELECT ph.phrase, COUNT(*) AS n_occurrences,
       |    MAX(ph.len) AS len,
       |    round(CAST(MAX(psc.pscore) AS DOUBLE), 4) AS score_r
       |  FROM ph JOIN psc ON psc.doc_id = ph.doc_id AND psc.isl = ph.isl
       |  WHERE ph.len >= 2 GROUP BY 1)
       |SELECT CAST(rank() OVER (ORDER BY score_r DESC, phrase) AS INT)
       |    AS rnk,
       |  phrase, n_occurrences, len, score_r
       |FROM bt
       |QUALIFY rnk <= 15
       |ORDER BY rnk""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "i24_scd4" -> i24Scd4,
    "ev_markov_steady" -> evMarkovSteady,
    "t_keyphrase_rake" -> tKeyphraseRake)

  val oracleSql: Map[String, String] = Map(
    "i24_scd4" -> i24Scd4Sql,
    "ev_markov_steady" -> evMarkovSteadySql,
    "t_keyphrase_rake" -> tKeyphraseRakeSql)
}
