package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
