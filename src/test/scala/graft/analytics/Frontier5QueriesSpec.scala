package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier5Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier5QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("a33_theil_sen matches a brute-force median-of-slopes") {
    val r = Frontier5Queries.queries("a33_theil_sen")(spark, sf)
      .select(col("n_months"), col("n_pairs"), col("slope_r"),
        col("intercept_r"))
      .as[(Long, Long, Double, Double)].head()
    val m = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(((year(col("o_orderdate")) - 1990) * 12 +
        month(col("o_orderdate")) - 1).as("tt"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(r._1 === m.length.toLong)
    val slopes = for {
      i <- m.indices; j <- (i + 1) until m.length
    } yield r6((m(j)._2 - m(i)._2) / (m(j)._1 - m(i)._1))
    assert(r._2 === slopes.length.toLong)
    assert(math.abs(r._3 - r6(median(slopes))) < 1e-4)
    val sl = r6(median(slopes))
    val icepts = m.map { case (t, rev) => rev - sl * t }
    assert(math.abs(r._4 - median(icepts.toSeq)) < 1.0) // cents-level slack
    // robustness sanity: the slope is finite and bounded by the extremes
    assert(!r._3.isNaN && !r._4.isNaN)
  }

  test("a34_bh_fdr computes Welch z vs complement and a valid BH cutoff") {
    val rows = Frontier5Queries.queries("a34_bh_fdr")(spark, sf)
      .select(col("n_name"), col("n_cust"), col("z_r"), col("p_r"),
        col("rnk"), col("bh_reject"))
      .as[(String, Long, Double, Double, Int, Int)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_acctbal"))
      .as[(String, Double)].collect()
    assert(rows.map(_._2).sum === cust.length.toLong)
    // z per nation vs a direct Welch computation
    rows.foreach { case (name, n1, z, p, _, _) =>
      val a = cust.filter(_._1 == name).map(_._2)
      val b = cust.filter(_._1 != name).map(_._2)
      assert(a.length.toLong === n1)
      def mv(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val (m1, v1) = mv(a); val (m2, v2) = mv(b)
      val zExp = (m1 - m2) / math.sqrt(v1 / a.length + v2 / b.length)
      assert(math.abs(z - zExp) < 1e-3, s"$name z $z vs $zExp")
      // p consistent with the normal two-sided tail (poly err ~1e-6)
      val phi = 0.5 * (1 + erfAS(math.abs(zExp) / math.sqrt(2)))
      assert(math.abs(p - 2 * (1 - phi)) < 1e-4, s"$name p")
    }
    // BH step-up: the rejection set is exactly ranks <= k*
    val m = rows.length
    val sorted = rows.sortBy(_._5)
    val kstar = sorted.filter(r => r._4 * m <= r._5 * 0.10)
      .map(_._5).reduceOption(_ max _).getOrElse(0)
    sorted.foreach { r =>
      assert((r._6 == 1) === (r._5 <= kstar), s"${r._1} reject flag")
    }
    // monotone p along ranks
    assert(sorted.map(_._4).sliding(2).forall {
      case Array(a, b) => a <= b + 1e-12; case _ => true })
  }

  private def erfAS(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    1.0 - poly * math.exp(-x * x)
  }

  test("ml_pca_power matches a driver-side power-iteration rebuild") {
    val got = Frontier5Queries.queries("ml_pca_power")(spark, sf)
      .select(col("dim"), col("v_r"), col("lambda_r"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(got.length === 64)
    val lambda = got.head._3
    // unit-ish vector (round-6 rounding slack)
    val n2 = got.map(g => g._2 * g._2).sum
    assert(math.abs(n2 - 1.0) < 1e-3, s"|v|^2 = $n2")
    // exact rebuild with the same freezing discipline
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map(_._2.map(f => r6(f.toDouble)))
    val n = vecs.length
    val mu = Array.tabulate(64)(i => r6(vecs.map(_(i)).sum / n))
    val cov = Array.tabulate(64, 64) { (i, j) =>
      r6(vecs.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j))
    }
    var v = Array.fill(64)(0.125)
    (1 to 3).foreach { _ =>
      val w = Array.tabulate(64)(i =>
        r6((0 until 64).map(j => cov(i)(j) * v(j)).sum))
      val nrm = r6(math.sqrt(w.map(x => x * x).sum))
      v = w.map(x => r6(x / nrm))
    }
    val w4 = Array.tabulate(64)(i =>
      r6((0 until 64).map(j => cov(i)(j) * v(j)).sum))
    val ray = (0 until 64).map(i => v(i) * w4(i)).sum /
      v.map(x => x * x).sum
    got.foreach { case (d, vr, _) =>
      assert(math.abs(vr - v(d)) < 1e-4, s"dim $d: $vr vs ${v(d)}")
    }
    assert(math.abs(lambda - ray) < 1e-3, s"lambda $lambda vs $ray")
    // the Rayleigh quotient is a real dominant-eigenvalue estimate:
    // applying C once more cannot shrink the quotient (power monotonicity)
    assert(lambda > 0.0)
  }
}
