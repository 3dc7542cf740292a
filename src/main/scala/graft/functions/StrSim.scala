package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the MDM/fuzzy-match scorer Spark
  * lacks as a built-in (it ships only levenshtein). Classic Jaro with
  * a floor(max/2)-1 match window and half-transposition count, plus the
  * Winkler common-prefix boost (up to 4 chars, weight 0.1) applied only
  * when the Jaro score exceeds 0.7 — the textbook parameters, which are
  * also exactly what DuckDB's `jaro_winkler_similarity` computes
  * (verified empirically over 300 random word-salad pairs; the one
  * deliberate quirk matched: two empty strings score 0.0, not 1.0).
  * That agreement is what makes entries built on it hash-provable
  * against the oracle.
  *
  * Byte-oriented (exact for ASCII inputs like the TPC-H name columns);
  * one fused loop over the two byte arrays, no per-row allocation
  * beyond two small flag arrays, and a plain static call from
  * whole-stage codegen — the same shape Spark core uses for
  * levenshtein.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    StrSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StrSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StrSim {

  /** Jaro-Winkler over the UTF-8 bytes; DuckDB-equivalent semantics. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(l1, l2))
      while (p < pMax && s1(p) == s2(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: native Jaro-Winkler similarity in [0, 1]. */
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register for SQL entry points on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "scala_udf")
}
