package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier27Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier27QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ml_roc_auc equals the brute-force pairwise probability") {
    val got = Frontier27Queries.queries("ml_roc_auc")(spark, sf)
      .select(col("n_pos"), col("n_neg"), col("auc_r"), col("gini_r"))
      .as[(Long, Long, Double, Double)].collect().head
    val cust = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(when(year(col("o_orderdate")) < 1998,
        col("o_totalprice"))).as("score"),
        max(when(year(col("o_orderdate")) >= 1998, 1L).otherwise(0L))
          .as("y"))
      .filter(col("score").isNotNull)
      .select(col("score").cast("double"), col("y"))
      .as[(Double, Long)].collect()
    val pos = cust.filter(_._2 == 1L).map(_._1)
    val neg = cust.filter(_._2 == 0L).map(_._1)
    assert(got._1 === pos.length.toLong && got._2 === neg.length.toLong)
    if (neg.nonEmpty && pos.nonEmpty) {
      // AUC = P(score_pos > score_neg) + 0.5 P(tie), brute force
      var wins = 0.0
      for (p <- pos; n <- neg) {
        if (p > n) wins += 1.0 else if (p == n) wins += 0.5
      }
      val exp = wins / (pos.length.toDouble * neg.length)
      assert(math.abs(got._3 - exp) < 1e-6, s"auc ${got._3} vs $exp")
      assert(math.abs(got._4 - (2 * got._3 - 1)) < 1e-6)
    } else {
      // degenerate one-class corpus: 0.5 coin-flip convention
      assert(got._3 === 0.5 && math.abs(got._4) < 1e-9)
    }
  }

  test("t_embedding_outliers ranks by true centroid distance") {
    val got = Frontier27Queries.queries("t_embedding_outliers")(spark, sf)
      .select(col("rnk"), col("vec_id"), col("dist_r"))
      .as[(Int, Long, Double)].collect()
    assert(got.length >= 10)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val frozen = emb.map { case (k, v) =>
      k -> v.map(f => r6(f.toDouble)) }.toMap
    val dim = frozen.head._2.length
    val cen = (0 until dim).map { d =>
      val xs = frozen.values.map(_(d))
      r6((xs.sum / xs.size).toDouble)
    }
    val dists = frozen.map { case (id, v) =>
      id -> r6(math.sqrt(v.zip(cen).map { case (a, c) =>
        ((a - c) * (a - c)).toDouble }.sum)).toDouble
    }
    val expTop = dists.toSeq.sortBy { case (id, d) => (-d, id) }.take(10)
    got.take(10).zip(expTop).foreach { case ((_, vid, d), (evid, ed)) =>
      assert(vid === evid, s"outlier order $vid vs $evid")
      assert(math.abs(d - ed) < 1e-5, s"dist $d vs $ed")
    }
  }

  test("q43_price_index is 100 at base and tracks matched baskets") {
    val got = Frontier27Queries.queries("q43_price_index")(spark, sf)
      .select(col("mon"), col("n_parts"), col("laspeyres_r"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // base month indexes to exactly 100
    assert(math.abs(got.head._3 - 100.0) < 1e-6,
      s"base ${got.head._3}")
    // base month includes its full basket; later months only matched
    got.foreach { case (_, np, idx) =>
      assert(np >= 1 && np <= got.head._2)
      assert(idx > 0.0)
    }
  }
}
