package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** The DSv2 sequence source must clamp generation bounds from pushed
  * range filters (visible in the BatchScan description), leave
  * non-range predicates as residuals without losing correctness, and
  * prune unread columns out of the reader. */
class SeqSourceSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  private def read(start: Long, end: Long) =
    spark.read.format("graft.sources.SeqSource")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", "4").load()

  test("full scan produces the whole range") {
    assert(read(0, 10000).count() === 10000)
    val r = read(5, 8).collect().map(_.getLong(0)).sorted
    assert(r === Array(5L, 6L, 7L))
  }

  test("range filters clamp the scan (pushdown, not post-filter)") {
    val df = read(0, 1000000)
      .filter(col("id") >= 250000L && col("id") < 750000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=250000") && plan.contains("hi=750000"),
      s"bounds not clamped in scan:\n$plan")
    assert(df.count() === 500000)
  }

  test("equality pushdown and residual filters compose") {
    val eq = read(0, 1000).filter(col("id") === 42L)
    assert(eq.queryExecution.executedPlan.toString.contains("lo=42, hi=43"))
    assert(eq.count() === 1)
    // bucket predicate is NOT pushable — must still be correct
    val res = read(0, 1000).filter(col("bucket") === 5L)
    assert(res.count() === read(0, 1000).collect()
      .count(r => r.getLong(0) % 97 == 5))
  }

  test("column pruning reaches the reader") {
    val df = read(0, 100).select("bucket")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=bucket"), s"pruning missing:\n$plan")
    assert(df.distinct().count() === 97)
  }

  test("empty clamp yields zero rows, not an error") {
    assert(read(0, 100).filter(col("id") >= 500L).count() === 0)
  }

  test("clustered scan reports key-grouped layout: groupBy slice has no exchange") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.read.format("graft.sources.SeqSource")
        .option("start", "0").option("end", "100000")
        .option("slices", "8").option("clustered", "true").load()
        .groupBy("slice").agg(count(lit(1)).as("n"), sum("id").as("s"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned aggregate still shuffles:\n$plan")
      // identical results to the unclustered path (which does shuffle)
      val flat = spark.read.format("graft.sources.SeqSource")
        .option("start", "0").option("end", "100000")
        .option("slices", "8").load()
        .groupBy("slice").agg(count(lit(1)).as("n"), sum("id").as("s"))
      assert(df.collect().toSet === flat.collect().toSet)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("storage-partitioned join: two clustered scans join without exchange") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def clustered(end: Long) = spark.read
        .format("graft.sources.SeqSource")
        .option("start", "0").option("end", end.toString)
        .option("slices", "8").option("clustered", "true").load()
      val a = clustered(50000).groupBy("slice")
        .agg(count(lit(1)).as("na"))
      val b = clustered(30000).groupBy("slice")
        .agg(sum("id").as("sb"))
      val j = a.join(b, "slice")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join still shuffles:\n$plan")
      assert(j.count() === 8)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
