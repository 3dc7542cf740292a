package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier11Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier11QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ml_cluster_quality: DB index aggregates the per-cluster worst ratios") {
    val rows = Frontier11Queries.queries("ml_cluster_quality")(spark, sf)
      .select(col("cid"), col("n_vecs"), col("s_r"), col("worst_partner"),
        col("r_max_r"), col("db_index_r"))
      .as[(Int, Long, Double, Int, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // one global DB value, equal to the mean of per-cluster worst ratios
    assert(rows.map(_._6).distinct.length === 1)
    val db = rows.head._6
    assert(math.abs(db - rows.map(_._5).sum / rows.length) < 1e-5)
    rows.foreach { case (cid, n, s, wp, rmax, _) =>
      assert(n > 0 && s >= 0.0 && rmax > 0.0)
      assert(wp != cid, s"cluster $cid is its own worst partner")
    }
    // cluster sizes agree with the kmeans entry
    val km = Frontier4Queries.queries("ml_kmeans_embed")(spark, sf)
      .select(col("cid"), col("n_vecs")).as[(Int, Long)].collect().toMap
    rows.foreach(r => assert(km(r._1) === r._2))
  }

  test("p_budget_waterfill allocates the budget with a single water level") {
    val rows = Frontier11Queries.queries("p_budget_waterfill")(spark, sf)
      .select(col("source"), col("tokens"), col("alloc"), col("level_r"))
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val budget = total / 2
    val level = rows.head._4
    assert(rows.forall(_._4 === level))
    rows.foreach { case (src, t, a, _) =>
      assert(a === math.min(t, math.floor(level).toLong), s"$src alloc")
      assert(a <= t)
    }
    // the achieved allocation is within n of the budget (floor slack)
    val achieved = rows.map(_._3).sum
    assert(achieved <= budget)
    assert(budget - achieved <= rows.length.toLong, s"$achieved vs $budget")
    // sources below the level keep everything; sources above are capped
    rows.foreach { case (_, t, a, _) =>
      if (t <= level) assert(a === t) else assert(a === math.floor(level))
    }
  }

  test("f_bitwise_pack matches driver-side bit arithmetic") {
    val rows = Frontier11Queries.queries("f_bitwise_pack")(spark, sf)
      .select(col("st"), col("n"), col("pop_total"), col("xor_fold"),
        col("and_low"), col("or_low"), col("shift_sum"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderstatus"), col("o_orderkey"))
      .as[(String, Long)].collect()
    assert(rows.map(_._2).sum === orders.length.toLong)
    rows.foreach { case (st, n, pop, xf, al, ol, ss) =>
      val ks = orders.filter(_._1 == st).map(_._2)
      assert(n === ks.length.toLong)
      assert(pop === ks.map(java.lang.Long.bitCount(_).toLong).sum)
      assert(xf === ks.reduce(_ ^ _))
      assert(al === ks.map(_ & 255L).reduce(_ & _))
      assert(ol === ks.map(_ & 255L).reduce(_ | _))
      assert(ss === ks.map(k => (k & 65535L) << 3).sum)
    }
  }
}
