package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier17Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier17QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t_zipf_fit matches a driver-side log-log OLS rebuild") {
    val got = Frontier17Queries.queries("t_zipf_fit")(spark, sf)
      .select(col("n_terms"), col("top_term"), col("slope_r"),
        col("intercept_r"), col("r2_r"))
      .as[(Long, String, Double, Double, Double)].collect().head
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect()
      .flatMap(_.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length }
    val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
    assert(got._1 === ranked.length.toLong)
    assert(got._2 === ranked.head._1._1)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = ranked.map { case ((_, f), i) =>
      (r6(math.log(i + 1.0)), r6(math.log(f.toDouble)))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got._3 - slope) < 1e-4, s"slope ${got._3} vs $slope")
    // frequency is non-increasing in rank, so the fitted slope is <= 0
    assert(got._3 <= 0.0)
    assert(got._5 >= 0.0 && got._5 <= 1.0)
  }

  test("geo_knn_join keeps at most 3 nearest in-ring suppliers each") {
    val got = Frontier17Queries.queries("geo_knn_join")(spark, sf)
      .select(col("n_name"), col("n_matched_custs"), col("n_pairs"),
        col("d2_sum"), col("pair_checksum"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nc, np, _, _) =>
      assert(np <= 3 * nc, "at most 3 pairs per matched customer")
      assert(np >= nc, "every matched customer has >= 1 pair")
    }
    // brute-force rebuild of the bounded-kNN contract
    val custs = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey")).as[(Long, Int)].collect()
    val sups = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey")).as[Long].collect()
    val cell = 32L
    val expPairs = custs.flatMap { case (ck, _) =>
      val cx = (ck * 37 + 11) % 1000; val cy = (ck * 73 + 29) % 1000
      sups.flatMap { sk =>
        val sx = (sk * 53 + 17) % 1000; val sy = (sk * 97 + 43) % 1000
        val inRing = math.abs(sx / cell - cx / cell) <= 1 &&
          math.abs(sy / cell - cy / cell) <= 1
        val d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
        if (inRing && d2 <= cell * cell) Some((ck, sk, d2)) else None
      }.sortBy(p => (p._3, p._2)).take(3)
    }
    val nations = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).as[(Int, String)]
      .collect().toMap
    val custNation = custs.toMap
    val expByNation = expPairs.groupBy(p => nations(custNation(p._1)))
    got.foreach { case (n, nc, np, d2s, ck) =>
      val exp = expByNation(n)
      assert(np === exp.length.toLong, s"$n pairs")
      assert(nc === exp.map(_._1).distinct.length.toLong, s"$n custs")
      assert(d2s === exp.map(_._3).sum, s"$n d2 sum")
      assert(ck === exp.map(p => p._1 * p._2).sum, s"$n checksum")
    }
    assert(got.map(_._1).toSet === expByNation.keySet)
  }

  test("a39_jackknife variance matches a brute-force leave-one-out") {
    val got = Frontier17Queries.queries("a39_jackknife")(spark, sf)
      .select(col("g"), col("theta_all_r"), col("theta_bar"),
        col("jack_var_r"), col("jack_se_r"))
      .as[(Long, Double, String, Double, Double)].collect().head
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"),
        col("o_totalprice").cast("decimal(18,4)"))
      .as[(Int, java.math.BigDecimal)].collect()
      .map { case (n, p) => (n, BigDecimal(p)) }
    val groups = rows.groupBy(_._1)
    val g = groups.size
    assert(got._1 === g.toLong)
    val nTot = rows.length
    val sTot = rows.map(_._2).sum
    assert(math.abs(got._2 - (sTot / nTot).toDouble) < 1e-3)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val thetas = groups.values.map { grp =>
      val ni = grp.length; val si = grp.map(_._2).sum
      r6(((sTot - si) / (nTot - ni)).toDouble)
    }.toSeq
    val bar = r6((thetas.sum / g).toDouble)
    val ssd = thetas.map(t => (t - bar) * (t - bar)).sum
    val expVar = (g - 1).toDouble / g * ssd.toDouble
    assert(math.abs(got._4 - expVar) < math.max(1e-3, expVar * 1e-5),
      s"var ${got._4} vs $expVar")
    assert(math.abs(got._5 * got._5 - got._4) < 1e-2, "se^2 == var")
  }
}
