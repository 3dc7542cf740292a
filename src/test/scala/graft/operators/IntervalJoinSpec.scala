package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Bucketed interval-overlap join: must equal the brute-force inequality
  * join exactly — every pair once, none twice — for any bucket width,
  * including widths much smaller and larger than the interval lengths. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def randIntervals(n: Int, seed: Int, maxLen: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(maxLen).toLong)
    }.toDF("id", "start", "end")
  }

  private def brute(a: org.apache.spark.sql.DataFrame,
                    b: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] = {
    val bb = b.select(col("id").as("b_id"), col("start").as("b_start"),
      col("end").as("b_end"))
    a.select(col("id").as("a_id"), col("start").as("a_start"), col("end").as("a_end"))
      .crossJoin(bb)
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_id"), col("b_id"),
        greatest(col("a_start"), col("b_start")),
        least(col("a_end"), col("b_end")))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("matches brute force, emits every pair exactly once") {
    val a = randIntervals(150, seed = 3, maxLen = 40)
    val b = randIntervals(150, seed = 4, maxLen = 40)
    val want = brute(a, b)
    for (w <- Seq(5L, 37L, 500L)) {
      val rows = IntervalJoin.overlap(a, b, "id", "start", "end", bucketW = w)
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length === rows.toSet.size, s"duplicates at bucketW=$w")
      assert(rows.toSet === want, s"bucketW=$w")
    }
  }

  test("touching endpoints overlap; disjoint intervals don't") {
    val a = Seq((1L, 0L, 10L)).toDF("id", "start", "end")
    val b = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("id", "start", "end")
    val got = IntervalJoin.overlap(a, b, "id", "start", "end", bucketW = 4L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 10L, 10L)))
  }

  test("empty sides yield empty results") {
    val none = Seq.empty[(Long, Long, Long)].toDF("id", "start", "end")
    val some = Seq((1L, 0L, 5L)).toDF("id", "start", "end")
    assert(IntervalJoin.overlap(none, some, "id", "start", "end", 7L).count() === 0)
    assert(IntervalJoin.overlap(some, none, "id", "start", "end", 7L).count() === 0)
  }
}
