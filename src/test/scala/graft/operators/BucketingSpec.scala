package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Bucketed joins must produce correct results with NO shuffle exchange
  * on either side — the co-location contract.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  test("same-bucketed tables join without an Exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Bucketing.writeBucketed(li.select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(
      o.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "b_orders", "l_orderkey", 8)
    // disable broadcast so the test exercises the shuffle-vs-bucket path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val n = joined.count()
      assert(n === li.count()) // every lineitem matches exactly one order
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // correctness vs the plain join
      val plain = li.select("l_orderkey", "l_quantity")
        .join(o.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          Seq("l_orderkey"))
      assert(joined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
