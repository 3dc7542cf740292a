package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier25Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier25QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ev_ab_srm_check chi2 matches the hash assignment exactly") {
    val got = Frontier25Queries.queries("ev_ab_srm_check")(spark, sf)
      .select(col("event_type"), col("n_a"), col("n_b"), col("chi2_r"),
        col("srm_flag"))
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(got.exists(_._1 == "ALL"))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = graft.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().as[Long].collect()
    val arms = users.map(u =>
      u -> java.lang.Long.parseLong(md5hex(s"ab:$u").take(8), 16) % 2)
      .toMap
    val all = got.find(_._1 == "ALL").get
    assert(all._2 === arms.values.count(_ == 0).toLong)
    assert(all._3 === arms.values.count(_ == 1).toLong)
    got.foreach { case (_, na, nb, chi2, flag) =>
      val exp = math.pow((na - nb).toDouble, 2) / (na + nb)
      assert(math.abs(chi2 - exp) < 1e-6)
      assert(flag === (exp > 3.841459))
    }
  }

  test("dq_completeness_trend planted outage fires the drift flag twice") {
    val got = Frontier25Queries.queries("dq_completeness_trend")(spark, sf)
      .select(col("day"), col("n_events"), col("missing_rate"),
        col("drift_flag"))
      .as[(Long, Long, String, Boolean)].collect().sortBy(_._1)
    assert(got.length >= 28, "one row per day of the month")
    // day 17 has the outage: its rate is far above every other day
    val d17 = got.find(_._1 == 17L).get
    val others = got.filter(_._1 != 17L)
    assert(BigDecimal(d17._3) > BigDecimal("0.3"), s"day-17 ${d17._3}")
    others.foreach(d =>
      assert(BigDecimal(d._3) < BigDecimal("0.10"), s"day ${d._1}"))
    // the alarm fires on the outage day and the recovery day (tiny
    // sf0.001 day-samples can also legitimately cross the 5-point
    // threshold elsewhere — every flag must be a genuine >5pt move)
    val flagged = got.filter(_._4).map(_._1).toSet
    assert(flagged.contains(17L) && flagged.contains(18L), s"$flagged")
    got.sliding(2).foreach {
      case Array(prev, cur) =>
        val moved = (BigDecimal(cur._3) - BigDecimal(prev._3)).abs >
          BigDecimal("0.05")
        assert(cur._4 === moved, s"day ${cur._1} flag vs move")
      case _ => ()
    }
    // event counts conserve
    assert(got.map(_._2).sum ===
      graft.Tables.load(spark, sf, "events").count())
  }

  test("ev_velocity_flags finds exactly the trailing-hour bursts") {
    val got = Frontier25Queries.queries("ev_velocity_flags")(spark, sf)
      .select(col("user_id"), col("peak_burst"), col("peak_sec"),
        col("n_at_peak"))
      .as[(Long, Long, Long, Long)].collect()
    val p = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000000000").as("sec"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val exp = p.flatMap { case (u, xs) =>
      val secs = xs.map(_._2).sorted
      val bursts = secs.map(s0 => s0 ->
        secs.count(s1 => s1 > s0 - 3601 && s1 <= s0))
      val peak = bursts.map(_._2).max
      if (peak >= 2)
        Some((u, peak.toLong, bursts.filter(_._2 == peak).map(_._1).min,
          bursts.count(_._2 == peak).toLong))
      else None
    }.toSeq.sortBy(_._1)
    assert(got.sortBy(_._1).toSeq === exp,
      s"got ${got.length} flagged vs exp ${exp.length}")
  }
}
