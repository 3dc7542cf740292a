package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions
import graft.textops.{TextFunctions => TF}

/** The native one-pass BpeTokenCount must agree exactly with the
  * composable three-regex form on real documents and on adversarial
  * inputs (empties, unicode incl. astral plane, whitespace zoo), and
  * propagate nulls. */
class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("native equals composable on real documents") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cmp = docs.select(
      TF.bpeTokenEstimate(col("text")).as("native"),
      TF.bpeTokenEstimateComposable(col("text")).as("composable"))
    assert(cmp.filter(col("native") =!= col("composable")).count() === 0)
  }

  test("native equals composable on adversarial strings") {
    val rows = Seq("", " ", "abc", "abcd", "abcde", "1234", "a1!",
      "  tabs\tand\nnewlines\r\f ", "éàü café", "日本語テキスト",
      "mixed é1a!? x", "😀 emoji 😀😀",
      "punct-only!!! ???", "ALLCAPSALPHA", "a b c d e f g")
    val df = rows.toDF("s")
    val cmp = df.select(col("s"),
      TF.bpeTokenEstimate(col("s")).as("native"),
      TF.bpeTokenEstimateComposable(col("s")).as("composable"))
    cmp.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch on ${r.getString(0)}")
    }
  }

  test("null propagates") {
    val n = Seq(Tuple1("x")).toDF("s")
      .select(TF.bpeTokenEstimate(lit(null).cast("string")))
    assert(n.head().isNullAt(0))
  }
}
