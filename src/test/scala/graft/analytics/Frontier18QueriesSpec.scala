package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier18Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier18QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ml_svm_hinge epochs improve the hinge loss and fit the labels") {
    val got = Frontier18Queries.queries("ml_svm_hinge")(spark, sf)
      .select(col("epoch"), col("n_violators"), col("n_correct"),
        col("hinge_r"), col("w_norm1"))
      .as[(Int, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(got.length === 2)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val Array(e1, e2) = got
    // epoch-1 weights already classify better than chance: the first
    // update step IS the class-mean direction (w1 ∝ Σ y·x / n)
    assert(e1._3 > n / 2, s"epoch-1 accuracy ${e1._3}/$n")
    // the second epoch reduces mean hinge loss on the train set
    assert(e2._4 <= e1._4 + 1e-9, s"hinge ${e2._4} !<= ${e1._4}")
    got.foreach { case (_, nv, nc, h, wn) =>
      assert(nv <= n && nc <= n)
      assert(h >= 0)
      assert(BigDecimal(wn) > 0)
    }
  }

  test("a42_permutation_test p-value is valid and the observed gap real") {
    val got = Frontier18Queries.queries("a42_permutation_test")(spark, sf)
      .select(col("k"), col("n_ge"), col("obs_diff"), col("p_r"))
      .as[(Long, Long, String, Double)].collect().head
    assert(got._1 === 20L)
    assert(got._2 >= 0 && got._2 <= 20)
    // add-one estimator bounds
    assert(got._4 >= 1.0 / 21 - 1e-9 && got._4 <= 1.0)
    assert(math.abs(got._4 - (got._2 + 1.0) / 21.0) < 1e-6)
    // observed |mean gap| matches a driver-side rebuild
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_mktsegment"), col("o_totalprice")
        .cast("decimal(18,4)"))
      .as[(String, java.math.BigDecimal)].collect()
      .map { case (g, p) => (g, BigDecimal(p)) }
    val (a, b) = rows.partition(_._1 == "BUILDING")
    val exp = ((a.map(_._2).sum / a.length).toDouble -
      (b.map(_._2).sum / b.length).toDouble).abs
    assert(math.abs(BigDecimal(got._3).toDouble - exp) < 1e-3)
  }

  test("t_js_divergence is bounded by ln 2 and zero only for the corpus") {
    val got = Frontier18Queries.queries("t_js_divergence")(spark, sf)
      .select(col("source"), col("n_tokens"), col("jsd_r"))
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, nt, jsd) =>
      assert(nt > 0, src)
      // JSD in nats is bounded by ln 2; tiny negatives can only come
      // from term rounding, so allow epsilon
      assert(jsd >= -1e-4 && jsd <= math.log(2.0) + 1e-6, s"$src $jsd")
    }
    // a source IS part of the corpus mixture, so no source can match
    // the corpus exactly unless all sources share one distribution;
    // verify at least one source genuinely diverges
    assert(got.exists(_._3 > 1e-4))
    // driver-side JSD rebuild for the first source
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val all = docs.flatMap(d => toks(d._2))
    val src0 = got.head._1
    val mine = docs.filter(_._1 == src0).flatMap(d => toks(d._2))
    val gf = all.groupBy(identity).map { case (w, x) => w -> x.length }
    val sfq = mine.groupBy(identity).map { case (w, x) => w -> x.length }
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = gf.keys.map { w =>
      val p = r9(sfq.getOrElse(w, 0).toDouble / mine.length)
      val q = r9(gf(w).toDouble / all.length)
      val m = (p + q) / 2.0
      val lp = if (p > 0) r6((p / 2.0) * math.log(p / m)) else BigDecimal(0)
      lp + r6((q / 2.0) * math.log(q / m))
    }
    val exp = terms.sum.toDouble
    val gotJsd = got.find(_._1 == src0).get._3
    assert(math.abs(gotJsd - exp) < 1e-4, s"$src0 jsd $gotJsd vs $exp")
  }
}
