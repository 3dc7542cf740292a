package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier3Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier3QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ev_survival_km matches a driver-side Kaplan-Meier rebuild") {
    val got = Frontier3Queries.queries("ev_survival_km")(spark, sf)
      .select(col("dur"), col("n_risk"), col("d_events"), col("c_events"),
        col("surv_r"))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // survival is non-increasing and within [0, 1]
    assert(got.map(_._5).sliding(2).forall {
      case Array(a, b) => b <= a + 1e-9; case _ => true })
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    // brute force from the events table
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        to_date(graft.Tables.eventTs("ts")).as("d"))
    val endD = ev.agg(max(col("d"))).as[java.sql.Date].head()
    val subj = ev.as[(Long, String, java.sql.Date)].collect()
      .groupBy(_._1).toSeq.map { case (_, rows) =>
        val first = rows.map(_._3.toLocalDate).min(
          Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
        val purch = rows.filter(_._2 == "purchase").map(_._3.toLocalDate)
        if (purch.nonEmpty) {
          val p = purch.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
          (java.time.temporal.ChronoUnit.DAYS.between(first, p), 1)
        } else
          (java.time.temporal.ChronoUnit.DAYS.between(first,
            endD.toLocalDate), 0)
      }
    var surv = 1.0
    val exp = subj.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (dur, xs) =>
        val nRisk = subj.count(_._1 >= dur)
        val dEv = xs.count(_._2 == 1)
        if (dEv > 0) {
          surv *= (nRisk - dEv).toDouble / nRisk
          Some((dur, nRisk.toLong, dEv.toLong, xs.size.toLong - dEv, surv))
        } else None
    }
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3 && g._4 === e._4)
      assert(math.abs(g._5 - e._5) < 1e-4, s"dur ${g._1}: ${g._5} vs ${e._5}")
    }
  }

  test("q29_cusum_shift reproduces the sequential CUSUM recursion") {
    val got = Frontier3Queries.queries("q29_cusum_shift")(spark, sf)
      .select(col("d"), col("rev_d"), col("s_plus_d"), col("s_minus_d"),
        col("shift_flag"))
      .as[(java.sql.Date, Double, Double, Double, Int)].collect()
      .sortBy(_._1.toString)
    assert(got.nonEmpty)
    val xs = got.map(_._2)
    val n = xs.length
    val mu = math.rint(xs.sum / n * 1e4) / 1e4
    val sd = math.rint(math.sqrt(
      xs.map(x => x * x).sum / n - (xs.sum / n) * (xs.sum / n)) * 1e4) / 1e4
    val k = math.rint(sd / 2.0 * 1e4) / 1e4
    var sp = 0.0; var sm = 0.0
    got.foreach { case (d, x, gsp, gsm, _) =>
      sp = math.max(0.0, sp + (x - mu - k))
      sm = math.max(0.0, sm + (mu - k - x)) // = max(0, sm - (x - mu + k))
      assert(math.abs(gsp - sp) < 1e-2, s"$d s_plus $gsp vs $sp")
      assert(math.abs(gsm - sm) < 1e-2, s"$d s_minus $gsm vs $sm")
    }
    // both statistics are nonnegative everywhere
    assert(got.forall(r => r._3 >= 0.0 && r._4 >= 0.0))
    assert(got.forall(r => r._5 == 0 || r._5 == 1))
  }

  test("a31_multireg minimizes SSE locally and reports sane R2") {
    val r = Frontier3Queries.queries("a31_multireg")(spark, sf)
      .select(col("n"), col("b0_r"), col("b1_r"), col("b2_r"), col("r2_r"))
      .as[(Long, Double, Double, Double, Double)].head()
    val (n, b0, b1, b2, r2) = r
    val data = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("x1"),
        sum(col("o_totalprice")).as("y"))
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("x1"), col("c_acctbal").as("x2"), col("y"))
      .as[(Double, Double, Double)].collect()
    assert(n === data.length.toLong)
    def sse(c0: Double, c1: Double, c2: Double): Double =
      data.map { case (x1, x2, y) =>
        val e = y - c0 - c1 * x1 - c2 * x2; e * e }.sum
    val base = sse(b0, b1, b2)
    // the fitted coefficients are a local minimum of SSE (perturbation test)
    for (eps <- Seq(1e-3, -1e-3)) {
      assert(sse(b0 + eps * 100, b1, b2) >= base - 1e-6)
      assert(sse(b0, b1 + eps, b2) >= base - 1e-6)
      assert(sse(b0, b1, b2 + eps) >= base - 1e-6)
    }
    val ybar = data.map(_._3).sum / data.length
    val sst = data.map { case (_, _, y) => (y - ybar) * (y - ybar) }.sum
    assert(math.abs(r2 - (1.0 - base / sst)) < 1e-3)
    assert(r2 > 0.0 && r2 <= 1.0)
  }

  test("a32_kendall_tau matches a brute-force pair count") {
    val r = Frontier3Queries.queries("a32_kendall_tau")(spark, sf)
      .select(col("n"), col("nc_d"), col("nd_d"), col("tau_b_r"))
      .as[(Long, Double, Double, Double)].head()
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("int"),
        round(col("l_discount") * 100).cast("int"))
      .as[(Int, Int)].collect()
    assert(r._1 === rows.length.toLong)
    var nc = 0L; var nd = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val s = (rows(i)._1 - rows(j)._1).sign * (rows(i)._2 - rows(j)._2).sign
      if (s > 0) nc += 1 else if (s < 0) nd += 1
    }
    assert(r._2 === nc.toDouble && r._3 === nd.toDouble)
    val nn = rows.length.toDouble
    val t1 = rows.groupBy(_._1).values.map(g =>
      g.size.toDouble * (g.size - 1)).sum
    val t2 = rows.groupBy(_._2).values.map(g =>
      g.size.toDouble * (g.size - 1)).sum
    val tau = 2.0 * (nc - nd) /
      math.sqrt((nn * (nn - 1) - t1) * (nn * (nn - 1) - t2))
    assert(math.abs(r._4 - tau) < 1e-6)
  }
}
