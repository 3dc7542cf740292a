package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier10Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier10QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("s22_csv_quarantine surfaces exactly the malformed rows") {
    val got = Frontier10Queries.queries("s22_csv_quarantine")(spark, sf)
      .select(col("status"), col("n_rows"), col("total_price_d"),
        col("n_corrupt"))
      .as[(Option[String], Long, Double, Long)].collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[(Long, String, Double)].collect()
    assert(got.map(_._2).sum === orders.length.toLong)
    val corrupt = got.filter(_._1.isEmpty)
    assert(corrupt.length === 1)
    assert(corrupt.head._4 === orders.count(_._1 % 17 == 0).toLong)
    assert(corrupt.head._2 === corrupt.head._4)
    // clean buckets carry no corruption and exact totals
    got.filter(_._1.isDefined).foreach { case (Some(st), n, tot, nc) =>
      assert(nc === 0L)
      val exp = orders.filter(o => o._1 % 17 != 0 && o._2 == st)
      assert(n === exp.length.toLong)
      val expTot = exp.map(o => BigDecimal(o._3).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      assert(math.abs(tot - expTot.toDouble) < 0.01, s"$st total")
    case _ => fail()
    }
  }

  test("ml_calibration_bins reports consistent reliability rows") {
    val rows = Frontier10Queries.queries("ml_calibration_bins")(spark, sf)
      .select(col("bin"), col("n"), col("mean_p_r"), col("obs_rate_r"),
        col("ece_part_r"))
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val nTot = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_._2).sum === nTot)
    rows.foreach { case (bin, n, mp, obs, ece) =>
      assert(bin >= 0 && bin <= 9)
      // the mean prediction sits inside its own bin
      assert(mp >= bin / 10.0 - 1e-6 && mp < (bin + 1) / 10.0 + 0.1,
        s"bin $bin mean_p $mp")
      assert(obs >= 0.0 && obs <= 1.0)
      // the ECE summand is |obs - pred| weighted by the bin mass
      assert(math.abs(ece - math.abs(obs - mp) * n / nTot) < 1e-5,
        s"bin $bin ece")
    }
  }

  test("q33_segment_migration builds a complete movement matrix") {
    val got = Frontier10Queries.queries("q33_segment_migration")(spark, sf)
      .select(col("seg_before"), col("seg_after"), col("n_cust"))
      .as[(String, String, Long)].collect()
    val labels = Set("low", "mid", "high", "none")
    assert(got.forall(r => labels(r._1) && labels(r._2)))
    assert(!got.exists(r => r._1 == "none" && r._2 == "none"))
    // every active customer appears exactly once
    val nActive = spark.read.parquet(s"$sf/orders.parquet")
      .select(countDistinct(col("o_custkey"))).as[Long].head()
    assert(got.map(_._3).sum === nActive)
    // tercile balance: each present segment holds roughly a third of
    // that period's customers
    val before = got.filter(_._1 != "none").groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._3).sum }
    val beforeTot = before.values.sum
    before.values.foreach(v =>
      assert(math.abs(v - beforeTot / 3.0) < beforeTot * 0.1))
  }
}
