package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** The insert-only delta rule must reproduce the from-scratch join
  * row-for-row (as a multiset) for ANY split of either side into
  * base + delta — including empty deltas and empty bases. */
class JoinIvmSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val a = {
    val rnd = new scala.util.Random(3)
    (1 to 300).map(i => (rnd.nextInt(40).toLong, i.toLong))
      .toDF("k", "a_payload")
  }
  private lazy val b = {
    val rnd = new scala.util.Random(5)
    (1 to 500).map(i => (rnd.nextInt(40).toLong, i * 10L))
      .toDF("k", "b_payload")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("k", "a_payload", "b_payload")
      .as[(Long, Long, Long)].collect().toSeq.sorted

  private lazy val full = canon(a.join(b, Seq("k")))

  for (seed <- Seq(1, 2, 3)) {
    test(s"maintained view equals the from-scratch join (random split $seed)") {
      val sa = hash(col("a_payload"), lit(seed)) % 2 === 0
      val sb = hash(col("b_payload"), lit(seed)) % 2 === 0
      val (a0, da) = (a.filter(sa), a.filter(!sa))
      val (b0, db) = (b.filter(sb), b.filter(!sb))
      val base = a0.join(b0, Seq("k"))
      val got = canon(JoinIvm.maintain(base, a0, da, b0, db, Seq("k")))
      assert(got === full)
    }
  }

  test("empty deltas leave the view unchanged") {
    val base = a.join(b, Seq("k"))
    val got = canon(JoinIvm.maintain(base, a, a.limit(0), b, b.limit(0), Seq("k")))
    assert(got === full)
  }

  test("empty bases: the whole join arrives as the delta-delta term") {
    val base = a.limit(0).join(b.limit(0), Seq("k"))
    val got = canon(JoinIvm.maintain(base, a.limit(0), a, b.limit(0), b, Seq("k")))
    assert(got === full)
  }
}
