package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier30Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier30QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("a51_power_analysis matches the closed-form sizing identity") {
    val got = Frontier30Queries.queries("a51_power_analysis")(spark, sf)
      .select(col("c_mktsegment"), col("n"), col("mean_r"), col("sd_r"),
        col("n_per_arm_for_2pct_r"), col("mde_at_current_n_r"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.length === 5)
    got.foreach { case (seg, n, mean, sd, nArm, mde) =>
      assert(n > 0 && mean > 0 && sd > 0, seg)
      // identity: n_per_arm = 15.697674 * sd^2 / (0.02*mean)^2
      val exp = 15.697674 * sd * sd / math.pow(0.02 * mean, 2)
      assert(math.abs(nArm - exp) / exp < 1e-3, s"$seg $nArm vs $exp")
      // identity: mde = sqrt(kappa * var / (n/2)) / mean
      val expMde = math.sqrt(15.697674 * sd * sd / (n / 2.0)) / mean
      assert(math.abs(mde - expMde) < 1e-4, s"$seg mde")
      // more variance or smaller effect => more samples than the
      // current table holds: detectability at current n is far above 2%
      assert(mde > 0.02 == (nArm > n / 2.0), s"$seg consistency")
    }
  }

  test("x13_retention_sweep applies each segment's clock to the anchor") {
    val got = Frontier30Queries.queries("x13_retention_sweep")(spark, sf)
      .select(col("c_mktsegment"), col("n_rows"), col("n_purgeable"),
        col("purgeable_revenue"), col("earliest_kept"),
        col("purge_rate_r"))
      .as[(String, Long, Long, String, String, Double)].collect()
    assert(got.length === 5)
    val policy = Map("AUTOMOBILE" -> 3, "BUILDING" -> 4,
      "FURNITURE" -> 5, "HOUSEHOLD" -> 6, "MACHINERY" -> 7)
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), to_date(col("o_orderdate"))
        .cast("string"), col("o_totalprice").cast("decimal(18,4)"))
      .as[(String, String, java.math.BigDecimal)].collect()
    val anchor = java.time.LocalDate.parse(rows.map(_._2).max)
    got.foreach { case (seg, n, np, rev, kept, rate) =>
      val mine = rows.filter(_._1 == seg)
      assert(n === mine.length.toLong)
      val cutoff = anchor.minusMonths(12L * policy(seg))
      val purge = mine.filter(r =>
        java.time.LocalDate.parse(r._2).isBefore(cutoff))
      assert(np === purge.length.toLong, s"$seg purgeable")
      if (purge.nonEmpty)
        assert(BigDecimal(rev) === purge.map(r => BigDecimal(r._3)).sum)
      val keptDates = mine.filter(r =>
        !java.time.LocalDate.parse(r._2).isBefore(cutoff))
      if (keptDates.nonEmpty)
        assert(kept === keptDates.map(_._2).min, s"$seg earliest kept")
      assert(math.abs(rate - np.toDouble / n) < 1e-6)
    }
    // longer clocks purge less (rates non-increasing in policy years)
    val bySeg = got.map(r => r._1 -> r._6).toMap
    assert(bySeg("AUTOMOBILE") >= bySeg("MACHINERY"))
  }

  test("j29_churn_anti_join marks exactly the no-follow-up orders") {
    val got = Frontier30Queries.queries("j29_churn_anti_join")(spark, sf)
      .select(col("mon"), col("n_orders"), col("n_censored"),
        col("n_churn_points"), col("churn_rate_r"))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string"))
      .as[(Long, Long, String)].collect()
    val edge = java.time.LocalDate.parse(orders.map(_._3).max)
    val byCust = orders.groupBy(_._1)
    val marks = byCust.values.flatMap { os =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.zipWithIndex.map { case ((_, _, ds), i) =>
        val d = java.time.LocalDate.parse(ds)
        val censored =
          java.time.temporal.ChronoUnit.DAYS.between(d, edge) < 90
        val churn = !censored && (i + 1 >= sorted.length || {
          val nxt = java.time.LocalDate.parse(sorted(i + 1)._3)
          java.time.temporal.ChronoUnit.DAYS.between(d, nxt) > 90
        })
        (d.getYear * 12 + d.getMonthValue, censored, churn)
      }
    }.toSeq
    got.foreach { case (mon, n, nc, nch, rate) =>
      val mine = marks.filter(_._1 == mon)
      assert(n === mine.length.toLong, s"mon $mon orders")
      assert(nc === mine.count(_._2).toLong, s"mon $mon censored")
      assert(nch === mine.count(_._3).toLong, s"mon $mon churn")
      val denom = n - nc
      if (denom > 0)
        assert(math.abs(rate - nch.toDouble / denom) < 1e-6)
    }
    // months fully inside the censoring window have zero measurable
    val lastMon = edge.getYear * 12 + edge.getMonthValue
    got.filter(_._1 == lastMon).foreach { m =>
      assert(m._2 === m._3, "edge month fully censored")
    }
  }
}
