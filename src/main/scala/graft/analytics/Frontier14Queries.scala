package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 widening, second pack: Bradley–Terry pairwise-preference
  * strength fitting (the model behind every LLM arena leaderboard —
  * Hunter 2004's MM iteration, public algorithm), SAX time-series
  * symbolization (Lin et al. 2003 — z-normalize, PAA, breakpoint
  * alphabet; the classic motif/anomaly preprocessing), and exact
  * repeated-substring span detection across documents (the Lee et
  * al. 2022 "Deduplicating Training Data" exact-substring variant,
  * bounded to 8-gram granularity).
  *
  * House determinism rules: exact integer/decimal arithmetic, each
  * double born as ONE rounded expression over exact inputs and frozen
  * as DECIMAL(18,6) before any reordering sum, total ORDER BYs.
  */
object Frontier14Queries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val TF = graft.textops.TextFunctions

  // ------------------------------------------------------------------
  // eval_bradley_terry — Bradley–Terry strengths for the 5 order
  // priorities from within-customer pairwise outcomes: every pair of
  // a customer's orders with DIFFERENT priorities is one comparison,
  // won by the higher o_totalprice (exact-tie pairs are discarded).
  // The pair generation is a self-join on o_custkey — per-key
  // bounded-quadratic work that shuffles on the customer axis only —
  // and collapses immediately to the 5×5 win matrix, so the MM
  // fitting (two Hunter-2004 iterations from p=1, each strength ONE
  // rounded double frozen as DECIMAL(18,6), then a final normalize
  // to shares) runs on a constant-size aggregate at any data scale.
  // ------------------------------------------------------------------
  private val evalBradleyTerry: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderpriority").as("pri"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("tp"),
        col("o_orderkey").as("ok"))
    val a = o.select(col("ck"), col("pri").as("pi"), col("tp").as("ti"),
      col("ok").as("oi"))
    val b = o.select(col("ck"), col("pri").as("pj"), col("tp").as("tj"),
      col("ok").as("oj"))
    // oi < oj canonicalizes the unordered pair; pri inequality keeps
    // only cross-item comparisons, strict price inequality drops ties
    val wins = a.join(b, "ck")
      .filter(col("oi") < col("oj") && col("pi") =!= col("pj") &&
        col("ti") =!= col("tj"))
      .select(
        when(col("ti") > col("tj"), col("pi")).otherwise(col("pj"))
          .as("win"),
        when(col("ti") > col("tj"), col("pj")).otherwise(col("pi"))
          .as("lose"))
      .groupBy("win", "lose").agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    // n_ij (total comparisons between i and j) and W_i (total wins)
    val nij = wins.select(col("win").as("i"), col("lose").as("j"), col("w"))
      .unionAll(wins.select(col("lose").as("i"), col("win").as("j"),
        col("w")))
      .groupBy("i", "j").agg(sum(col("w")).as("n"))
    val wi = wins.groupBy(col("win").as("i")).agg(sum(col("w")).as("wins"))
    def mmIter(p: DataFrame): DataFrame = {
      // p: (i, p) with DECIMAL(18,6) strengths; one MM update:
      // p_i' = W_i / Σ_j n_ij/(p_i+p_j), each term frozen decimal
      val terms = nij
        .join(p.select(col("i"), col("p").as("pi")), "i")
        .join(p.select(col("i").as("j"), col("p").as("pj")), "j")
        .select(col("i"),
          round(col("n").cast("double") /
            (col("pi") + col("pj")).cast("double"), 6)
            .cast(DecimalType(18, 6)).as("term"))
      terms.groupBy("i").agg(sum(col("term")).as("den"))
        .join(wi, "i")
        .select(col("i"),
          round(col("wins").cast("double") / col("den").cast("double"), 6)
            .cast(DecimalType(18, 6)).as("p"))
    }
    val p0 = nij.select(col("i")).distinct()
      .select(col("i"), lit(1.0).cast(DecimalType(18, 6)).as("p"))
    val p2 = mmIter(mmIter(p0)).localCheckpoint(true)
    val tot = p2.agg(sum(col("p")).as("tot"))
    p2.crossJoin(tot)
      .select(col("i").as("priority"), col("p").cast("string").as("strength"),
        round(col("p").cast("double") / col("tot").cast("double"), 6)
          .as("share_r"))
      .orderBy("priority")
  }
  private val evalBradleyTerrySql =
    """WITH o AS (SELECT o_custkey AS ck, o_orderpriority AS pri,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS tp, o_orderkey AS ok
      |  FROM orders),
      |wins AS (SELECT
      |    CASE WHEN a.tp > b.tp THEN a.pri ELSE b.pri END AS win,
      |    CASE WHEN a.tp > b.tp THEN b.pri ELSE a.pri END AS lose,
      |    COUNT(*) AS w
      |  FROM o a JOIN o b ON a.ck = b.ck AND a.ok < b.ok
      |    AND a.pri <> b.pri AND a.tp <> b.tp
      |  GROUP BY 1, 2),
      |nij AS (SELECT i, j, SUM(w) AS n FROM (
      |    SELECT win AS i, lose AS j, w FROM wins
      |    UNION ALL SELECT lose, win, w FROM wins) GROUP BY 1, 2),
      |wi AS (SELECT win AS i, SUM(w) AS wins FROM wins GROUP BY 1),
      |p0 AS (SELECT DISTINCT i, CAST(1.0 AS DECIMAL(18,6)) AS p FROM nij),
      |t1 AS (SELECT nij.i,
      |    CAST(round(CAST(nij.n AS DOUBLE)
      |      / CAST(pa.p + pb.p AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
      |  FROM nij JOIN p0 pa ON pa.i = nij.i JOIN p0 pb ON pb.i = nij.j),
      |p1 AS (SELECT t1.i,
      |    CAST(round(CAST(wi.wins AS DOUBLE)
      |      / CAST(SUM(t1.term) AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
      |  FROM t1 JOIN wi ON wi.i = t1.i GROUP BY t1.i, wi.wins),
      |t2 AS (SELECT nij.i,
      |    CAST(round(CAST(nij.n AS DOUBLE)
      |      / CAST(pa.p + pb.p AS DOUBLE), 6) AS DECIMAL(18,6)) AS term
      |  FROM nij JOIN p1 pa ON pa.i = nij.i JOIN p1 pb ON pb.i = nij.j),
      |p2 AS (SELECT t2.i,
      |    CAST(round(CAST(wi.wins AS DOUBLE)
      |      / CAST(SUM(t2.term) AS DOUBLE), 6) AS DECIMAL(18,6)) AS p
      |  FROM t2 JOIN wi ON wi.i = t2.i GROUP BY t2.i, wi.wins),
      |tot AS (SELECT SUM(p) AS tot FROM p2)
      |SELECT p2.i AS priority, CAST(p2.p AS VARCHAR) AS strength,
      |  round(CAST(p2.p AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6)
      |    AS share_r
      |FROM p2, tot ORDER BY priority""".stripMargin

  // ------------------------------------------------------------------
  // w22_sax — SAX symbolization of each region's monthly revenue
  // series: z-normalize against the region's own mean/std (exact
  // integer-decimal sufficient statistics n, Σx, Σx² — std is ONE
  // rounded double), PAA-average consecutive 3-month windows (each
  // monthly z frozen as DECIMAL(18,6), so the quarter mean is an
  // exact decimal sum ÷ 3-or-fewer), then map each PAA value onto
  // the 4-letter gaussian-breakpoint alphabet (±0.6745, 0 — the
  // standard-normal quartiles). Output: one SAX word per region via
  // an ordered array fold — series are monthly-grain aggregates, so
  // the whole symbolization runs on a data-scale-invariant table no
  // matter how many raw orders feed it.
  // ------------------------------------------------------------------
  private val w22Sax: QFn = (s, dir) => {
    val m = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mon"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
    val stats = m.groupBy(col("r_name").as("rn"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("sx"),
        sum(col("rev") * col("rev")).cast(DecimalType(38, 8)).as("sxx"),
        min(col("mon")).as("mon0"))
    val z = m.join(stats, col("r_name") === col("rn"))
      .select(col("r_name"), col("mon"), col("mon0"),
        round((col("rev") - col("sx") / col("n")).cast("double") /
          sqrt((col("sxx").cast("double") -
            (col("sx") * col("sx")).cast("double") / col("n").cast("double"))
            / col("n").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("zv"))
    val paa = z
      .select(col("r_name"),
        ((col("mon") - col("mon0")).cast("long") / 3).cast("long").as("q"),
        col("zv"))
      .groupBy("r_name", "q")
      .agg(count(lit(1)).as("nq"), sum(col("zv")).as("sz"))
      .select(col("r_name"), col("q"),
        round(col("sz").cast("double") / col("nq").cast("double"), 6)
          .as("paa"))
    val sym = paa.select(col("r_name"), col("q"),
      when(col("paa") < -0.6745, lit("a"))
        .when(col("paa") < 0.0, lit("b"))
        .when(col("paa") < 0.6745, lit("c"))
        .otherwise(lit("d")).as("sym"))
    sym.groupBy("r_name")
      .agg(count(lit(1)).as("n_quarters"),
        array_join(transform(array_sort(collect_list(struct(col("q"),
          col("sym")))), x => x.getField("sym")), "").as("sax_word"))
      .orderBy("r_name")
  }
  private val w22SaxSql =
    """WITH m AS (SELECT r_name,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS mon,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |st AS (SELECT r_name AS rn, COUNT(*) AS n, SUM(rev) AS sx,
      |    CAST(SUM(rev * rev) AS DECIMAL(38,8)) AS sxx,
      |    MIN(mon) AS mon0
      |  FROM m GROUP BY 1),
      |z AS (SELECT m.r_name, m.mon, st.mon0,
      |    CAST(round(CAST(m.rev - st.sx / st.n AS DOUBLE)
      |      / sqrt((CAST(st.sxx AS DOUBLE)
      |          - CAST(st.sx * st.sx AS DOUBLE) / CAST(st.n AS DOUBLE))
      |        / CAST(st.n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS zv
      |  FROM m JOIN st ON st.rn = m.r_name),
      |paa AS (SELECT r_name, (mon - mon0) // 3 AS q,
      |    round(CAST(SUM(zv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |      AS paa
      |  FROM z GROUP BY 1, 2),
      |sym AS (SELECT r_name, q,
      |    CASE WHEN paa < -0.6745 THEN 'a' WHEN paa < 0.0 THEN 'b'
      |         WHEN paa < 0.6745 THEN 'c' ELSE 'd' END AS sym
      |  FROM paa)
      |SELECT r_name, COUNT(*) AS n_quarters,
      |  string_agg(sym, '' ORDER BY q) AS sax_word
      |FROM sym GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // d_substring_spans — exact repeated-substring detection at 8-gram
  // granularity (the scalable variant of suffix-array substring
  // dedup): an 8-token shingle whose md5-derived 60-bit key appears
  // in ≥2 DISTINCT documents marks 8 duplicated token positions;
  // per document, overlapping duplicated shingles merge into maximal
  // spans by the gaps-and-islands rule (a new island starts when the
  // next shingle begins >8 tokens after the previous — [p,p+7]
  // ranges that touch merge). Everything shuffles on the 60-bit
  // shingle key, never the text; span merging is a per-doc window —
  // the same partition-by-doc discipline every pack uses. Output per
  // document with ≥1 span: span count, duplicated-token coverage,
  // token length — the numbers a curation pipeline thresholds on to
  // cut boilerplate (Lee et al. 2022).
  // ------------------------------------------------------------------
  private val dSubstringSpans: QFn = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        split(TF.normText(col("text")), " ").as("toks"))
    val toks = docs
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        posexplode(col("toks")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val sh = toks
      .withColumn("g", concat_ws(" ", (0 until 8).map(i =>
        if (i == 0) col("w") else lead(col("w"), i).over(wOrd)): _*))
      .withColumn("w7", lead(col("w"), 7).over(wOrd))
      .filter(col("w7").isNotNull)
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
    val dupKeys = sh.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val dupPos = sh.join(dupKeys, "h")
      .select(col("doc_id"), col("n_tokens"), col("pos"))
    val wSeq = Window.partitionBy("doc_id").orderBy("pos")
    val islands = dupPos
      .withColumn("prev", lag(col("pos"), 1).over(wSeq))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > 8, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy("doc_id", "n_tokens", "isl")
      .agg((max(col("pos")) + 8 - min(col("pos"))).as("span_len"))
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens").cast("long").as("dup_tokens"))
      .orderBy("doc_id")
  }
  private val dSubstringSpansSql = {
    val norm = TF.normTextSql("text")
    s"""WITH docs AS (SELECT doc_id, string_split($norm, ' ') AS toks
       |  FROM documents),
       |w0 AS (SELECT doc_id, len(list_filter(toks, x -> length(x) > 0))
       |      AS n_tokens,
       |    unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
       |  FROM docs),
       |w AS (SELECT doc_id, n_tokens, w,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
       |      AS pos
       |  FROM w0 WHERE length(w) > 0),
       |sh0 AS (SELECT doc_id, n_tokens, pos,
       |    w || ' ' || lead(w, 1) OVER wo || ' ' || lead(w, 2) OVER wo
       |      || ' ' || lead(w, 3) OVER wo || ' ' || lead(w, 4) OVER wo
       |      || ' ' || lead(w, 5) OVER wo || ' ' || lead(w, 6) OVER wo
       |      || ' ' || lead(w, 7) OVER wo AS g,
       |    lead(w, 7) OVER wo AS w7
       |  FROM w WINDOW wo AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT doc_id, n_tokens, pos,
       |    CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h
       |  FROM sh0 WHERE w7 IS NOT NULL),
       |dk AS (SELECT h FROM sh GROUP BY h
       |       HAVING COUNT(DISTINCT doc_id) >= 2),
       |dp AS (SELECT sh.doc_id, sh.n_tokens, sh.pos
       |  FROM sh JOIN dk ON dk.h = sh.h),
       |isl AS (SELECT doc_id, n_tokens, pos,
       |    SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       |  FROM (SELECT doc_id, n_tokens, pos,
       |      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |    FROM dp)),
       |sp AS (SELECT doc_id, n_tokens, isl,
       |    MAX(pos) + 8 - MIN(pos) AS span_len
       |  FROM isl GROUP BY 1, 2, 3)
       |SELECT doc_id, n_tokens, COUNT(*) AS n_spans,
       |  CAST(SUM(span_len) AS BIGINT) AS dup_tokens
       |FROM sp GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "eval_bradley_terry" -> evalBradleyTerry,
    "w22_sax" -> w22Sax,
    "d_substring_spans" -> dSubstringSpans)

  val oracleSql: Map[String, String] = Map(
    "eval_bradley_terry" -> evalBradleyTerrySql,
    "w22_sax" -> w22SaxSql,
    "d_substring_spans" -> dSubstringSpansSql)
}
