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

  test("BPE segment: greedy lowest-rank-first, all occurrences per step") {
    // hand-derived against the committed table ranks:
    // thether: t|h(1)→ th e th e r; th|e(2)→ the the r; the|r(32)→
    //          the ther (the LAST rule still fires — proof the loop
    //          re-scans after every merge instead of one-passing ranks)
    // anding:  i|n(3)→ a n d in g; a|n(4)→ an d in g; an|d(5); in|g(17)
    // another: th(1), the(2), a|n(4), an+o? no rule → an o the r → the|r(32)
    assert(BpeMerges.segment("thether").toSeq === Seq("the", "ther"))
    assert(BpeMerges.segment("anding").toSeq === Seq("and", "ing"))
    assert(BpeMerges.segment("another").toSeq === Seq("an", "o", "ther"))
    assert(BpeMerges.segment("a").toSeq === Seq("a"))
    assert(BpeMerges.segment("x9z").toSeq === Seq("x", "9", "z"))
    // rank order matters: in "stone", s|t(10) and o|n(7) and e|n(11) —
    // o|n fires first, killing e|n's chance only if overlapping (it
    // isn't): st on e
    assert(BpeMerges.segment("stone").toSeq === Seq("st", "on", "e"))
  }

  test("BPE segment: the native expression matches the Scala encoder and propagates null") {
    val words = Seq("thether", "anding", "another", "stone", "quiche")
    val got = words.toDF("w")
      .select(BpeMerges.bpe_segment(col("w"))).as[String].collect()
    assert(got.toSeq === words.map(BpeMerges.segment(_).mkString(" ")))
    val n = Seq(Tuple1("x")).toDF("s")
      .select(BpeMerges.bpe_segment(lit(null).cast("string")))
    assert(n.head().isNullAt(0))
  }
}
