package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-ish token estimate — bit-identical to the composable
  * form `ceil(len(re(s,'[^A-Za-z]'))/4.0) + len(re(s,'[^0-9]')) +
  * len(re(s,'[A-Za-z0-9\s]'))` (see
  * [[graft.textops.TextFunctions.bpeTokenEstimate]]'s original
  * definition), but in ONE code-point pass instead of three full regex
  * rewrites of the document. The token estimator sits on the hot path
  * of every token-budget operator (token counting, sequence packing,
  * shard planning, mixture weights), where three `regexp_replace`
  * passes per document dominate the scan. Character classes are the
  * ASCII ones Java regex uses for `[A-Za-z]`/`[0-9]`/`\s`, iterated by
  * code point so astral-plane characters count once, exactly like
  * `length()` counts them.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    BpeTokenCountHelper.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeTokenCountHelper.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCountHelper {
  /** ceil(alpha/4) + digits + punct over one code-point scan; `punct` =
    * anything that is neither ASCII alnum nor ASCII regex whitespace. */
  def count(s: UTF8String): Long = {
    val str = s.toString
    var alpha = 0L
    var digits = 0L
    var punct = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) alpha += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      else if (cp != ' ' && cp != '\t' && cp != '\n' && cp != 0x0B &&
               cp != '\f' && cp != '\r') punct += 1
      i += Character.charCount(cp)
    }
    (alpha + 3L) / 4L + digits + punct
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: native one-pass BPE token estimate. */
  def bpe_token_count(c: Column): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(c)))
}

/** REAL byte-pair-encoding segmentation (Sennrich et al., ACL'16; the
  * GPT-2-style greedy ENCODE): starting from single characters,
  * repeatedly find the adjacent token pair with the lowest merge-table
  * rank and fuse ALL its occurrences left-to-right, until no pair is in
  * the table. Space-joins the final pieces, so `size(split(out, ' '))`
  * is the true token count — the budget input the chars/4 estimate
  * ([[BpeTokenCount]]) only approximates.
  *
  * The merge table is the committed [[BpeMerges.table]] — the single
  * source of truth the DuckDB oracle's recursive-CTE replay is also
  * generated from, so both engines run textually the same algorithm.
  */
case class BpeSegment(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_segment expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  protected override def nullSafeEval(input: Any): Any =
    BpeMerges.segmentUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeMerges.segmentUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass language ID — bit-identical to the composable
  * argmax over [[graft.textops.TextFunctions.langScores]] (the 21
  * `regexp_replace` rewrites of the padded document, re-embedded per
  * argmax branch), but as ONE compiled scan: lowercase once, 20
  * substring-count loops (no allocation, no regex), one code-point
  * pass for the non-ASCII zh weight, then the same
  * greatest/precedence argmax. The curation100 probe measured the
  * composable lang gate at 146 s over 500k docs — 70% of the whole
  * curation pipeline — for work that is one linear scan per document.
  *
  * Exactness notes: `replace`-based counting yields the number of
  * NON-OVERLAPPING left-to-right occurrences (Java Matcher semantics),
  * which is precisely the `indexOf`/skip-by-length loop here — NOT a
  * token count (" the the " contains two "the" tokens but the padded
  * " the " pattern matches only once, the shared space being consumed);
  * lowercasing goes through the same UTF8String.toLowerCase primitive
  * Spark's `lower` uses; the zh weight counts code POINTS outside
  * [0x20, 0x7E] on the ORIGINAL string, matching
  * length(c) − length(regexp_replace(c, '[^ -~]', '')) for BMP and
  * astral input alike. Spec-enforced against the composable form. */
case class LangIdNative(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  protected override def nullSafeEval(input: Any): Any =
    LangIdHelper.best(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdHelper.best($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdHelper {
  // single source of truth: the same table langScores/langScoresSql use
  private val table: Array[(String, Array[String])] =
    graft.textops.TextFunctions.stopwords
      .map { case (l, ws) => (l, ws.map(w => s" $w ").toArray) }.toArray
  private val order: Array[String] =
    graft.textops.TextFunctions.langOrder.toArray

  private def countOcc(s: String, w: String): Int = {
    var n = 0
    var i = s.indexOf(w)
    while (i >= 0) { n += 1; i = s.indexOf(w, i + w.length) }
    n
  }

  def best(s: UTF8String): UTF8String = {
    val padded = " " + s.toLowerCase.toString + " "
    val scores = new java.util.HashMap[String, java.lang.Double](8)
    var li = 0
    while (li < table.length) {
      val (lang, words) = table(li)
      var sc = 0.0
      var wi = 0
      while (wi < words.length) { sc += countOcc(padded, words(wi)); wi += 1 }
      scores.put(lang, sc)
      li += 1
    }
    // zh: non-ASCII code points of the ORIGINAL string, weight 3
    val orig = s.toString
    var nonAscii = 0L
    var i = 0
    while (i < orig.length) {
      val cp = orig.codePointAt(i)
      if (cp < 0x20 || cp > 0x7E) nonAscii += 1
      i += Character.charCount(cp)
    }
    scores.put("zh", nonAscii * 3.0)
    var top = Double.NegativeInfinity
    var oi = 0
    while (oi < order.length) {
      val v = scores.get(order(oi)).doubleValue()
      if (v > top) top = v
      oi += 1
    }
    if (top <= 0.0) UTF8String.fromString("und")
    else {
      var best = order(order.length - 1)
      var found = false
      var bi = 0
      while (bi < order.length && !found) {
        if (scores.get(order(bi)).doubleValue() >= top) {
          best = order(bi); found = true
        }
        bi += 1
      }
      UTF8String.fromString(best)
    }
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: native one-pass language ID. */
  def lang_id(c: Column): Column =
    ColumnBridge.column(LangIdNative(ColumnBridge.expression(c)))
}

/** Native one-pass quality score — bit-identical to the composable
  * `alphaRatio·0.4 + (1−digitRatio)·0.2 + lengthTerm·0.2 + wordTerm·0.2`
  * (three `regexp_replace` rewrites + a normText split per document),
  * but as one code-point scan of the original string plus one of the
  * lowered string (word runs must count AFTER lowering — exotic
  * uppercase like U+212A lowers INTO [a-z0-9]). The word count
  * replicates `size(split(normText(c), " "))` exactly: the number of
  * maximal [a-z0-9] runs, floored at 1 because splitting an empty
  * normalized string yields one empty token. Double arithmetic uses
  * the same left-associated IEEE order as the Column tree. */
case class QualityScoreNative(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType

  protected override def nullSafeEval(input: Any): Any =
    QualityScoreHelper.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScoreHelper.score($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityScoreHelper {
  def score(s: UTF8String): Double = {
    val str = s.toString
    var len = 0L
    var alpha = 0L
    var digits = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      len += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) alpha += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      i += Character.charCount(cp)
    }
    // word runs over the LOWERED string (normText lowers first)
    val lower = s.toLowerCase.toString
    var runs = 0L
    var inRun = false
    var j = 0
    while (j < lower.length) {
      val cp = lower.codePointAt(j)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (alnum && !inRun) runs += 1
      inRun = alnum
      j += Character.charCount(cp)
    }
    val words = math.max(runs, 1L)
    val lenD = len.toDouble
    val alphaRatio = alpha.toDouble / math.max(lenD, 1.0)
    val digitRatio = digits.toDouble / math.max(lenD, 1.0)
    val lengthTerm = math.min(lenD / 500.0, 1.0)
    val wordTerm = math.min(words.toDouble / 50.0, 1.0)
    alphaRatio * 0.4 + (1.0 - digitRatio) * 0.2 +
      lengthTerm * 0.2 + wordTerm * 0.2
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: native one-pass quality score. */
  def quality_score(c: Column): Column =
    ColumnBridge.column(QualityScoreNative(ColumnBridge.expression(c)))
}

/** Greedy merge-table BPE encoder over an ARBITRARY rule table — the
  * engine behind both the committed-table [[BpeSegment]] and the
  * corpus-trained [[BpeSegmentWith]]. Serializable so a trained table
  * ships to executors as part of the expression (a plan-literal
  * artifact, like ANN codebooks — never a shuffle). */
final class BpeEncoder(val rules: Seq[(String, String)]) extends Serializable {

  private val rank: Map[(String, String), Int] = rules.zipWithIndex.toMap

  /** Greedy BPE encode; returns the pieces. Words are the post-normText
    * ASCII alnum tokens, so per-char splitting needs no codepoint care. */
  def segment(word: String): Array[String] = {
    var toks: Array[String] = word.map(_.toString).toArray
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (pa, pb) = rules(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == pa && toks(j + 1) == pb) {
            out += pa + pb; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        done = toks.length < 2
      }
    }
    toks
  }

  /** UTF8String bridge for codegen. */
  def segmentUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(segment(s.toString).mkString(" "))
}

/** Greedy BPE segmentation with a caller-supplied (e.g. corpus-TRAINED)
  * merge table — [[BpeSegment]]'s twin where the rules are a plan
  * artifact instead of the committed [[BpeMerges.table]]. Codegen
  * references the encoder through `addReferenceObj`, so the per-row
  * path is the same compiled scan either way. */
case class BpeSegmentWith(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_segment_with expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  @transient private lazy val enc = new BpeEncoder(rules)

  protected override def nullSafeEval(input: Any): Any =
    enc.segmentUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", enc,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segmentUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegmentWith {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: greedy BPE segmentation under `rules`, space-joined. */
  def bpe_segment_with(c: Column, rules: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeSegmentWith(ColumnBridge.expression(c), rules))
}

/** The committed BPE merge table + the greedy encoder both engines
  * share. Rules are ranked by position (applied lowest-rank-first, the
  * training order of a real tokenizer); later rules reference tokens
  * earlier rules produce (`th`+`e`, `in`+`g`, `the`+`r`).
  *
  * INVARIANT the oracle depends on: every rule has a ≠ b. With unequal
  * sides, occurrences of a pair within one merge step can never
  * overlap, which is what lets the DuckDB replay mark merge starts and
  * consumed positions with two independent positional predicates. The
  * Scala encoder ([[BpeEncoder]]) is the fully general left-to-right
  * scan (it would handle a == b too); [[table]] just never needs it. */
object BpeMerges {

  val table: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"),
    ("a", "l"), ("in", "g"), ("e", "d"), ("a", "r"), ("o", "f"),
    ("t", "o"), ("l", "e"), ("c", "h"), ("s", "h"), ("q", "u"),
    ("w", "h"), ("l", "y"), ("u", "s"), ("i", "s"), ("o", "m"),
    ("i", "c"), ("the", "r"))
  require(table.forall { case (a, b) => a != b },
    "BPE merge rules must have distinct sides (oracle precondition)")

  private val encoder = new BpeEncoder(table)

  /** Greedy BPE encode over the committed table; returns the pieces. */
  def segment(word: String): Array[String] = encoder.segment(word)

  /** UTF8String bridge for codegen ([[BpeSegment]]). */
  def segmentUtf8(s: UTF8String): UTF8String = encoder.segmentUtf8(s)

  /** The merge table as a DuckDB VALUES body `('a','b',rank), …` — the
    * oracle generator, so SQL and Scala can never disagree. */
  def sqlValues: String =
    table.zipWithIndex.map { case ((a, b), i) => s"('$a','$b',${i + 1})" }
      .mkString(", ")

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: greedy BPE segmentation, pieces space-joined. */
  def bpe_segment(c: Column): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(c)))
}
