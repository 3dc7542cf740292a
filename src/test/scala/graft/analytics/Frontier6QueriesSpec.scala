package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier6Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier6QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ml_logreg_newton matches a driver-side Newton rebuild and beats the base rate") {
    val r = Frontier6Queries.queries("ml_logreg_newton")(spark, sf)
      .select(col("n"), col("n_correct"), col("b0_r"), col("b1_r"),
        col("accuracy_r"))
      .as[(Long, Long, Double, Double, Double)].head()
    val data = spark.read.parquet(s"$sf/orders.parquet")
      .select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0)
          .otherwise(0.0).as("y"),
        col("o_totalprice"))
      .as[(Double, Double)].collect()
      .map { case (y, tp) => (y, r6(math.log(tp))) }
    assert(r._1 === data.length.toLong)
    // rebuild: two Newton steps with the same round-6 freezing
    var (b0, b1) = (0.0, 0.0)
    (1 to 2).foreach { _ =>
      var sw = 0.0; var swx = 0.0; var swxx = 0.0; var g0 = 0.0; var g1 = 0.0
      data.foreach { case (y, x) =>
        val p = r6(1.0 / (1.0 + math.exp(-(b0 + b1 * x))))
        val w = p * (1 - p)
        sw += w; swx += w * x; swxx += w * x * x
        g0 += y - p; g1 += x * (y - p)
      }
      val det = sw * swxx - swx * swx
      b0 = r6(b0 + (swxx * g0 - swx * g1) / det)
      b1 = r6(b1 + (sw * g1 - swx * g0) / det)
    }
    assert(math.abs(r._3 - b0) < 1e-4, s"b0 ${r._3} vs $b0")
    assert(math.abs(r._4 - b1) < 1e-4, s"b1 ${r._4} vs $b1")
    // the model's training accuracy is at least the majority-class rate
    val baseRate = math.max(data.count(_._1 == 1.0),
      data.count(_._1 == 0.0)).toDouble / data.length
    assert(r._5 >= baseRate - 1e-6, s"acc ${r._5} vs base $baseRate")
    assert(r._2 === math.round(r._5 * r._1))
  }

  test("q30_price_elasticity matches per-brand OLS on the log-log data") {
    val rows = Frontier6Queries.queries("q30_price_elasticity")(spark, sf)
      .select(col("p_brand"), col("n"), col("elasticity_r"),
        col("intercept_r"))
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length === 25)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)].collect()
    rows.foreach { case (brand, n, el, ic) =>
      val d = li.filter(_._1 == brand)
        .map { case (_, ep, q) => (r6(math.log(ep / q)), r6(math.log(q))) }
      assert(n === d.length.toLong)
      val nn = d.length.toDouble
      val sx = d.map(_._1).sum; val sy = d.map(_._2).sum
      val sxx = d.map(p => p._1 * p._1).sum
      val sxy = d.map(p => p._1 * p._2).sum
      val slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
      assert(math.abs(el - slope) < 1e-3, s"$brand slope $el vs $slope")
      assert(math.abs(ic - (sy - slope * sx) / nn) < 1e-3, s"$brand icpt")
      // demand curves slope down: elasticity is negative for every brand
      assert(el < 0.0, s"$brand elasticity $el not negative")
    }
  }

  test("a36_median_ci brackets the median with valid order-statistic ranks") {
    val rows = Frontier6Queries.queries("a36_median_ci")(spark, sf)
      .select(col("lang"), col("n"), col("med_r"), col("ci_lo"), col("ci_hi"))
      .as[(String, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars")).as[(String, Long)].collect()
    rows.foreach { case (lang, n, med, lo, hi) =>
      val xs = docs.filter(_._1 == lang).map(_._2).sorted
      assert(n === xs.length.toLong)
      assert(lo <= med && med <= hi, s"$lang: [$lo, $hi] vs $med")
      // the bounds are actual order statistics at the computed ranks
      val lrank = math.floor((n - 1.959964 * math.sqrt(n.toDouble)) / 2).toLong
      val urank = math.ceil(1.0 +
        (n + 1.959964 * math.sqrt(n.toDouble)) / 2).toLong
      assert(lo === xs((lrank - 1).toInt.max(0)), s"$lang lo")
      assert(hi === xs((urank - 1).toInt.min(xs.length - 1)), s"$lang hi")
    }
  }
}
