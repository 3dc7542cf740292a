package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier37Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier37QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("g_ppr concentrates mass near the seed's neighborhood") {
    val got = Frontier37Queries.queries("g_ppr")(spark, sf)
      .select(col("rnk"), col("l_partkey"), col("ppr_r"))
      .as[(Int, Long, Double)].collect()
    assert(got.length >= 10)
    got.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0) }
    got.sortBy(_._1).map(_._3).sliding(2).foreach {
      case Array(x, y) => assert(x >= y)
      case _ => ()
    }
    // rebuild graph; the top-ranked part must be a direct neighbor of
    // the seed (3 hops of a 0.85-damped walk keep most mass at hop 1)
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val edges = op.values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = edges ++ edges.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (v, xs) => v -> xs.size }
    val seed = deg.toSeq.minBy { case (v, d) => (-d, v) }._1
    val neighbors = und.filter(_._1 == seed).map(_._2).toSet
    assert(neighbors.contains(got.minBy(_._1)._2),
      "top PPR part neighbors the seed")
    // the seed itself is excluded
    assert(!got.exists(_._2 == seed))
  }

  test("w41_percentile_bands are ordered and bracket the median") {
    val got = Frontier37Queries.queries("w41_percentile_bands")(spark, sf)
      .select(col("mon"), col("n_orders"), col("p10_r"), col("p50_r"),
        col("p90_r"), col("spread_r"))
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (mon, n, p10, p50, p90, spread) =>
      assert(n > 0, mon)
      assert(p10 <= p50 && p50 <= p90, s"mon $mon ordering")
      assert(math.abs(spread - p90 / p10) < 1e-3)
    }
    assert(got.map(_._2).sum ===
      spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("a58_trimmed_mean drops the tails it claims to drop") {
    val got = Frontier37Queries.queries("a58_trimmed_mean")(spark, sf)
      .select(col("c_mktsegment"), col("n"), col("n_kept"),
        col("raw_mean_r"), col("trimmed_mean_r"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length === 5)
    got.foreach { case (seg, n, kept, raw, trimmed) =>
      // ~90% survives two-sided 5% trims (interpolated fences)
      assert(kept <= n && kept >= (n * 85) / 100, s"$seg kept $kept/$n")
      assert(raw > 0 && trimmed > 0)
      // order-price distributions are right-skewed: trimming the tails
      // moves the mean down (weak form: it moves it)
      assert(math.abs(raw - trimmed) > 1e-9, s"$seg trim had no effect")
    }
    // driver rebuild for one segment
    val seg0 = got.head._1
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg0)
      .select(col("o_totalprice").cast("decimal(18,4)").cast("double"))
      .as[Double].collect()
    def quantile(v: Array[Double], p: Double): Double = {
      val s = v.sorted; val h = (s.length - 1) * p
      val lo = s(h.toInt)
      if (h == h.toInt) lo else lo + (h - h.toInt) * (s(h.toInt + 1) - lo)
    }
    val lo = quantile(xs, 0.05); val hi = quantile(xs, 0.95)
    val trim = xs.filter(x => x > lo && x < hi)
    val exp = trim.sum / trim.length
    val row = got.find(_._1 == seg0).get
    assert(row._3 === trim.length.toLong)
    assert(math.abs(row._5 - exp) < 1e-2, s"$seg0 ${row._5} vs $exp")
  }
}
