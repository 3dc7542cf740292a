package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier21Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier21QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q36_decile_lift conserves buyers and ends at overall lift 1") {
    val got = Frontier21Queries.queries("q36_decile_lift")(spark, sf)
      .select(col("decile"), col("n_custs"), col("n_buyers"),
        col("capture_r"), col("cum_lift_r"))
      .as[(Int, Long, Long, Double, Double)].collect()
      .sortBy(-_._1)
    assert(got.nonEmpty && got.map(_._1).distinct.length === got.length)
    // totals reconcile against the raw tables
    val cust = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(when(year(col("o_orderdate")) < 1998,
          col("o_totalprice"))).as("pre"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("buyer"))
      .filter(col("pre").isNotNull)
      .select(col("buyer")).as[Long].collect()
    assert(got.map(_._2).sum === cust.length.toLong)
    assert(got.map(_._3).sum === cust.sum)
    // capture shares sum to 1
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
    // the full-population cumulative lift is exactly 1
    assert(math.abs(got.last._5 - 1.0) < 1e-3)
  }

  test("g_conductance is a valid cut ratio per nation community") {
    val got = Frontier21Queries.queries("g_conductance")(spark, sf)
      .select(col("n_name"), col("volume"), col("cut_edges"),
        col("conductance_r"))
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (n, vol, cut, phi) =>
      assert(vol > 0, n)
      assert(cut <= vol, s"$n cut bounded by volume")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"$n phi $phi")
    }
    // cut edges are symmetric: total cut volume is even
    assert(got.map(_._3).sum % 2 === 0)
  }

  test("a45_theil within+between reconstruct the total Theil index") {
    val got = Frontier21Queries.queries("a45_theil_decomposition")(
        spark, sf)
      .select(col("n_name"), col("share"), col("within"), col("between"))
      .as[(String, String, String, String)].collect()
    val (all, nations) = got.partition(_._1 == "ALL")
    assert(all.length === 1 && nations.length === 25)
    // shares over nations sum to ~1
    val shareSum = nations.map(r => BigDecimal(r._2)).sum
    assert((shareSum - 1).abs < BigDecimal("0.001"), s"shares $shareSum")
    // the ALL row's "within" is the TOTAL T; rebuild it directly from
    // the raw per-order stream: T = (1/N) Σ (x/μ)·ln(x/μ)
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_totalprice")).as[Double].collect()
    val mu = xs.sum / xs.length
    val tDirect = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    val tGot = BigDecimal(all.head._3).toDouble
    assert(math.abs(tGot - tDirect) < math.max(1e-3, tDirect * 0.01),
      s"total Theil $tGot vs direct $tDirect")
    // decomposition: Σ s_g·T_g + Σ between_g == total (frozen rounding)
    val tw = nations.map(r => BigDecimal(r._2) * BigDecimal(r._3)).sum
    val tb = nations.map(r => BigDecimal(r._4)).sum
    assert(((tw + tb) - BigDecimal(all.head._3)).abs
      < BigDecimal("0.001"))
    assert((tb - BigDecimal(all.head._4)).abs < BigDecimal("0.0001"))
  }
}
