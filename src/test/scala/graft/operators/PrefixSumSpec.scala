package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Distributed prefix sum: must equal the naive unpartitioned-window
  * running sum exactly, for any partition count, including partition
  * counts larger than the row count. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(7)
    (1 to 500).map(i => (i.toLong, BigDecimal(rnd.nextInt(100000), 2)))
      .toDF("id", "v")
  }

  private def naive = rows.withColumn("run",
    sum(col("v")).over(Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .select(col("id"), col("run").cast("string"))
    .as[(Long, String)].collect().toMap

  test("matches the single-window running sum exactly (7 partitions)") {
    val got = PrefixSum.withRunningSum(rows,
        Seq(col("v").desc, col("id")), col("v"), "run", partitions = 7)
      .select(col("id"), col("run").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got.size === 500)
    val want = naive
    got.foreach { case (id, run) =>
      assert(BigDecimal(run) === BigDecimal(want(id)), s"id=$id")
    }
  }

  test("matches with more partitions than rows") {
    val small = rows.limit(3)
    val got = PrefixSum.withRunningSum(small,
        Seq(col("v").desc, col("id")), col("v"), "run", partitions = 16)
      .agg(max(col("run")).cast("string")).as[String].head()
    val want = small.agg(sum(col("v")).cast("string")).as[String].head()
    assert(BigDecimal(got) === BigDecimal(want))
  }

  test("empty input yields an empty result") {
    val none = Seq.empty[(Long, BigDecimal)].toDF("id", "v")
    assert(PrefixSum.withRunningSum(none,
      Seq(col("v")), col("v"), "run", partitions = 4).count() === 0)
  }

  // ---- withRunningMaxLong ----

  private lazy val maxRows = {
    val rnd = new scala.util.Random(11)
    (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "v")
  }

  private def naiveMax(inclusive: Boolean): Map[Long, Option[Long]] = {
    val hi = if (inclusive) Window.currentRow else -1L
    maxRows.withColumn("run",
        max(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, hi)))
      .select(col("id"), col("run"))
      .as[(Long, Option[Long])].collect().toMap
  }

  for (parts <- Seq(7, 16); inclusive <- Seq(true, false)) {
    test(s"running max (inclusive=$inclusive) matches the single window " +
         s"at $parts partitions") {
      val got = PrefixSum.withRunningMaxLong(maxRows, Seq(col("id")),
          col("v"), "run", inclusive = inclusive, partitions = parts)
        .select(col("id"), col("run"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got.size === 400)
      val want = naiveMax(inclusive)
      got.foreach { case (id, run) => assert(run === want(id), s"id=$id") }
    }
  }

  test("exclusive running max: first row sees null") {
    val got = PrefixSum.withRunningMaxLong(maxRows, Seq(col("id")),
        col("v"), "run", inclusive = false, partitions = 5)
      .orderBy("id").select("run").limit(1)
      .as[Option[Long]].head()
    assert(got.isEmpty)
  }

  test("running max on empty input yields an empty result") {
    val none = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(PrefixSum.withRunningMaxLong(none, Seq(col("id")),
      col("v"), "run", partitions = 4).count() === 0)
  }
}
