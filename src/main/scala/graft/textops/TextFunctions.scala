package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Text-analysis primitives for large-scale training-data pipelines:
  * normalization, token counting, language ID, quality scoring, document
  * fingerprinting, shingling.
  *
  * Everything is a pure `Column` expression over built-ins — codegen'd,
  * no UDFs — so a 100 TB corpus scan stays in one WholeStageCodegen span
  * and each rule also has an exact SQL twin for the DuckDB oracle.
  */
object TextFunctions {

  /** Canonical form for dedup/fingerprints: lowercase, strip everything
    * outside [a-z0-9 ], squeeze whitespace runs, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  val normTextSql: String => String = c =>
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Whitespace token count over normalized text. */
  def wsTokenCount(c: Column): Column = size(split(normText(c), " "))
  val wsTokenCountSql: String => String = c =>
    s"CAST(len(string_split(${normTextSql(c)}, ' ')) AS INT)"

  /** BPE-ish token estimate: alpha runs count ~len/4 pieces each (ceil),
    * digits and punctuation are one token per char. A cheap, deterministic
    * stand-in for a real tokenizer's budget accounting. Runs on the
    * native one-pass expression (functions/TextExpressions) — the
    * composable three-regex twin below is the reference it is
    * spec-proven against (and what the DuckDB oracle mirrors). */
  def bpeTokenEstimate(c: Column): Column =
    graft.functions.BpeTokenCountHelper.bpe_token_count(c)

  /** The built-ins-only twin of [[bpeTokenEstimate]] — three regex
    * rewrites; kept as the reference implementation. */
  def bpeTokenEstimateComposable(c: Column): Column = {
    val alphaChars = length(regexp_replace(c, "[^A-Za-z]", ""))
    val digits = length(regexp_replace(c, "[^0-9]", ""))
    val punct = length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    (ceil(alphaChars.cast("double") / 4.0) + digits + punct).cast("long")
  }
  val bpeTokenEstimateSql: String => String = c =>
    s"""CAST(ceil(CAST(length(regexp_replace($c, '[^A-Za-z]', '', 'g')) AS DOUBLE) / 4.0)
       | + length(regexp_replace($c, '[^0-9]', '', 'g'))
       | + length(regexp_replace($c, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)""".stripMargin

  /** Occurrence count of `word` as a whole token:
    * (len(s) − len(replace(s, ' w ', ''))) / len(' w ') over ' '+s+' '. */
  private def occ(padded: Column, word: String): Column = {
    val w = s" $word "
    (length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(w), ""))).cast("double") / w.length.toDouble
  }
  private def occSql(padded: String, word: String): String = {
    val w = s" $word "
    s"CAST(length($padded) - length(replace($padded, '$w', '')) AS DOUBLE) / ${w.length}.0"
  }

  private[graft] val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "los", "las", "es", "una"),
    "fr" -> Seq("le", "les", "des", "est", "dans"))

  /** Per-language stopword-hit scores + a CJK/non-ASCII weight for zh. */
  def langScores(c: Column): Map[String, Column] = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val base = stopwords.map { case (lang, words) =>
      lang -> words.map(occ(padded, _)).reduce(_ + _)
    }.toMap
    val nonAscii =
      (length(c) - length(regexp_replace(c, "[^ -~]", ""))).cast("double")
    base + ("zh" -> nonAscii * 3.0)
  }

  def langScoresSql(c: String): Map[String, String] = {
    val padded = s"concat(' ', lower($c), ' ')"
    val base = stopwords.map { case (lang, words) =>
      lang -> words.map(occSql(padded, _)).mkString("(", " + ", ")")
    }.toMap
    base + ("zh" ->
      s"(CAST(length($c) - length(regexp_replace($c, '[^ -~]', '', 'g')) AS DOUBLE) * 3.0)")
  }

  private[graft] val langOrder = Seq("en", "de", "es", "fr", "zh")

  /** Heuristic language ID — the NATIVE one-pass expression
    * ([[graft.functions.LangIdNative]]): per-language stopword counts +
    * the non-ASCII zh weight and the argmax in one compiled scan. The
    * composable form below rebuilt the padded document through 21
    * `regexp_replace` passes, each re-embedded several times in the
    * argmax tree — the curation100 probe measured the lang gate at
    * 146 s over 500k docs, 70% of the whole pipeline. Semantics are
    * IDENTICAL by construction (same non-overlapping left-to-right
    * occurrence count the replace arithmetic yields; spec-enforced
    * against [[langIdComposable]]), so the unchanged SQL oracle still
    * hash-matches. */
  def langId(c: Column): Column = graft.functions.LangIdHelper.lang_id(c)

  /** The built-ins-only twin of [[langId]] — argmax of [[langScores]]
    * with deterministic precedence; kept as the reference
    * implementation the native expression is tested against. */
  def langIdComposable(c: Column): Column = {
    val s = langScores(c)
    val all = langOrder.map(s)
    val top = all.reduce((a, b) => greatest(a, b))
    langOrder.init.foldRight(lit(langOrder.last): Column) { (lang, rest) =>
      when(s(lang) >= top, lang).otherwise(rest)
    }.pipe(best => when(top <= 0.0, "und").otherwise(best))
  }

  def langIdSql(c: String): String = {
    val s = langScoresSql(c)
    val top = s"greatest(${langOrder.map(s).mkString(", ")})"
    val chain = langOrder.init.foldRight(s"'${langOrder.last}'") { (lang, rest) =>
      s"CASE WHEN ${s(lang)} >= $top THEN '$lang' ELSE $rest END"
    }
    s"CASE WHEN $top <= 0.0 THEN 'und' ELSE $chain END"
  }

  /** Composite quality score in [0,1]: rewards alpha-heavy, multi-word,
    * moderately long text; penalizes digit/punct noise. Deterministic
    * double arithmetic, identical in the SQL twin. Ships as the NATIVE
    * one-pass expression ([[graft.functions.QualityScoreNative]]) —
    * the composable form below costs 3 regexp rewrites + a split per
    * document (24 s over the curation probe's 500k docs); the native
    * scan produces bit-identical doubles (same counts, same IEEE
    * operation order; spec-enforced against [[qualityScoreComposable]]). */
  def qualityScore(c: Column): Column =
    graft.functions.QualityScoreHelper.quality_score(c)

  /** The built-ins-only twin of [[qualityScore]] — kept as the
    * reference implementation the native expression is tested against. */
  def qualityScoreComposable(c: Column): Column = {
    val len = length(c).cast("double")
    val alpha = length(regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    val digits = length(regexp_replace(c, "[^0-9]", "")).cast("double")
    val words = wsTokenCount(c).cast("double")
    val alphaRatio = alpha / greatest(len, lit(1.0))
    val digitRatio = digits / greatest(len, lit(1.0))
    val lengthTerm = least(len / 500.0, lit(1.0))
    val wordTerm = least(words / 50.0, lit(1.0))
    alphaRatio * 0.4 + (lit(1.0) - digitRatio) * 0.2 +
      lengthTerm * 0.2 + wordTerm * 0.2
  }
  def qualityScoreSql(c: String): String =
    s"""(CAST(length(regexp_replace($c, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |   / greatest(CAST(length($c) AS DOUBLE), 1.0)) * 0.4
       | + (1.0 - CAST(length(regexp_replace($c, '[^0-9]', '', 'g')) AS DOUBLE)
       |   / greatest(CAST(length($c) AS DOUBLE), 1.0)) * 0.2
       | + least(CAST(length($c) AS DOUBLE) / 500.0, 1.0) * 0.2
       | + least(CAST(${wsTokenCountSql(c)} AS DOUBLE) / 50.0, 1.0) * 0.2""".stripMargin

  /** Document fingerprint: md5 of the canonical form — byte-identical
    * documents after normalization share a fingerprint. */
  def fingerprint(c: Column): Column = md5(normText(c))
  val fingerprintSql: String => String = c => s"md5(${normTextSql(c)})"

  // ------------------------------------------------------ PII scrubbing

  /** PII patterns a corpus pipeline must find and scrub before training:
    * pattern + replacement sentinel, applied in a fixed order (emails
    * before phones so phone-like digit runs inside addresses are gone by
    * the time the phone rule runs). Java and DuckDB regex dialects agree
    * on this subset (character classes, bounded repetition, \b). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "[PHONE]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"))

  /** Redacted text: every PII pattern replaced by its sentinel. */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
  def redactPiiSql(c: String): String =
    // DuckDB string literals keep backslashes as-is, so the Java-side
    // pattern text passes through unchanged
    piiPatterns.foldLeft(c) { case (acc, (_, pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }

  /** Per-kind PII hit counts (same cascade order as [[redactPii]], so a
    * digit run consumed by an earlier rule is not double-counted). */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val staged = piiPatterns.scanLeft(c) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    piiPatterns.zip(staged).map { case ((kind, pat, _), input) =>
      kind -> regexp_count(input, lit(pat)).cast("int")
    }
  }
  def piiCountsSql(c: String): Seq[(String, String)] = {
    val staged = piiPatterns.scanLeft(c) { case (acc, (_, pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }
    piiPatterns.zip(staged).map { case ((kind, pat, _), input) =>
      kind -> s"CAST(len(regexp_extract_all($input, '$pat')) AS INT)"
    }
  }

  /** Word k-shingles of the normalized text (distinct, full-k only), as an
    * array column. Column-level convenience for small inputs and property
    * tests; the dedup pipeline uses Dedup's relational posexplode stage,
    * which is the codegen-friendly form of the same thing. */
  def wordShingles(c: Column, k: Int): Column = {
    val words = split(normText(c), " ")
    when(size(words) >= k,
      array_distinct(
        filter(
          transform(sequence(lit(0), size(words) - k),
            i => concat_ws(" ", slice(words, i + lit(1), lit(k)))),
          s => length(s) > 0)))
      .otherwise(array().cast("array<string>"))
  }
}
