package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

class TypedQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark

  test("typed aggregator matches the untyped groupBy result") {
    val dir = "/root/testdata/sf0.001"
    val typed = TypedQueries.revenueByFlag(spark, dir)
      .collect().map(s => s.flag -> ((s.n, BigDecimal(s.revenue).setScale(2, BigDecimal.RoundingMode.HALF_UP)))).toMap
    val untyped = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))).toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, (n, rev)) =>
      assert(n === untyped(k)._1)
      assert((rev - untyped(k)._2).abs <= BigDecimal(0.01)) // double-sum paths
    }
  }
}
