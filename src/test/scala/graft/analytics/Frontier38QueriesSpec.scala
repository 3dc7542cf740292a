package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier38Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier38QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("a59_two_proportion z and CI follow the closed forms") {
    val got = Frontier38Queries.queries("a59_two_proportion")(spark, sf)
      .select(col("n1"), col("k1"), col("n2"), col("k2"), col("diff_r"),
        col("z_r"), col("ci_lo_r"), col("ci_hi_r"), col("significant"))
      .as[(Long, Long, Long, Long, Double, Double, Double, Double,
        Boolean)].collect().head
    val (n1, k1, n2, k2) = (got._1, got._2, got._3, got._4)
    assert(k1 <= n1 && k2 <= n2)
    val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
    assert(math.abs(got._5 - (p1 - p2)) < 1e-6)
    val pPool = (k1 + k2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pPool * (1 - pPool) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(got._6 - z) < 1e-4, s"z ${got._6} vs $z")
    assert(got._7 <= got._5 && got._5 <= got._8, "CI brackets diff")
    assert(got._9 === (math.abs(z) > 1.959964))
  }

  test("x19_erasure_proof certifies an exact targeted delete") {
    val got = Frontier38Queries.queries("x19_erasure_proof")(spark, sf)
      .select(col("subject_key"), col("rows_before"), col("rows_after"),
        col("rows_erased"), col("checksum_before"),
        col("checksum_after"), col("erasure_exact"))
      .as[(Long, Long, Long, Long, String, String, Boolean)].collect()
      .head
    assert(got._7, "erasure must certify exact")
    assert(got._2 === spark.read.parquet(s"$sf/orders.parquet").count())
    val subjRows = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey") === got._1).count()
    assert(got._4 === subjRows, "erased exactly the subject's rows")
    assert(got._2 - got._3 === got._4)
    assert(BigInt(got._5) > BigInt(got._6),
      "checksum strictly decreases when rows leave")
  }

  test("a60_capture_recapture estimates within sampling error") {
    val got = Frontier38Queries.queries("a60_capture_recapture")(
        spark, sf)
      .select(col("true_n"), col("n1"), col("n2"), col("m"),
        col("lincoln_petersen_r"), col("chapman_r"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(got._1 === spark.read.parquet(s"$sf/documents.parquet")
      .count())
    assert(got._4 <= math.min(got._2, got._3))
    // identities
    if (got._4 > 0)
      assert(math.abs(got._5 -
        got._2.toDouble * got._3 / got._4) < 1e-2)
    assert(math.abs(got._6 -
      ((got._2 + 1.0) * (got._3 + 1.0) / (got._4 + 1.0) - 1.0)) < 1e-2)
    // independent ~20% samples put the estimate within a wide but
    // bounded corridor of truth (m is small at sf0.001 — hence Chapman)
    assert(got._6 > got._1 * 0.3 && got._6 < got._1 * 3.0,
      s"chapman ${got._6} vs true ${got._1}")
  }
}
