package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier9Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier9QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("a37_gini_split finds the argmax-gain threshold over the histogram") {
    val r = Frontier9Queries.queries("a37_gini_split")(spark, sf)
      .select(col("split_price"), col("n_left"), col("n_right"),
        col("gini_parent_r"), col("gini_split_r"), col("gain_r"))
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val data = spark.read.parquet(s"$sf/orders.parquet")
      .select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("y"),
        col("o_totalprice")).as[(Int, Double)].collect()
      .map { case (y, tp) => (y, math.min(math.floor(tp / 5000).toLong, 99L)) }
    assert(r._2 + r._3 === data.length.toLong)
    def gini(pos: Long, n: Long): Double = {
      val p = pos.toDouble / n
      1.0 - p * p - (1.0 - p) * (1.0 - p)
    }
    val nTot = data.length.toLong
    val posTot = data.count(_._1 == 1).toLong
    // exhaustive scan over all candidate buckets
    val buckets = data.map(_._2).distinct.sorted
    val scored = buckets.dropRight(1).map { b =>
      val left = data.filter(_._2 <= b)
      val nl = left.length.toLong
      val pl = left.count(_._1 == 1).toLong
      val g = gini(posTot, nTot) -
        (nl * gini(pl, nl) + (nTot - nl) * gini(posTot - pl, nTot - nl)) /
          nTot
      (b, nl, g)
    }
    val best = scored.maxBy(s => (s._3 - 1e-12, -s._2))
    assert(r._1 === (best._1 + 1) * 5000, s"split ${r._1}")
    assert(r._2 === best._2)
    assert(math.abs(r._6 - best._3) < 1e-4, s"gain ${r._6} vs ${best._3}")
    assert(r._6 >= 0.0 && r._5 <= r._4 + 1e-9)
  }

  test("q32_new_vs_returning decomposes monthly revenue exactly") {
    val got = Frontier9Queries.queries("q32_new_vs_returning")(spark, sf)
      .select(col("m"), col("rev_new_d"), col("rev_ret_d"), col("n_new"),
        col("n_ret"))
      .as[(java.sql.Date, Double, Double, Long, Long)].collect()
      .sortBy(_._1.toString)
    assert(got.nonEmpty)
    // total decomposed revenue equals total order revenue
    val totRev = spark.read.parquet(s"$sf/orders.parquet")
      .agg(sum(col("o_totalprice"))).as[Double].head()
    assert(math.abs(got.map(r => r._2 + r._3).sum - totRev) < 1.0)
    // the first month is all-new, and new-customer counts sum to the
    // distinct customer count
    assert(got.head._3 === 0.0 && got.head._5 === 0L)
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(countDistinct(col("o_custkey"))).as[Long].head()
    assert(got.map(_._4).sum === nCust)
  }

  test("g_luby_mis emits an independent set whose neighbors are all excluded") {
    val r = Frontier9Queries.queries("g_luby_mis")(spark, sf)
      .select(col("n_mis"), col("n_undecided"), col("mis_checksum"))
      .as[(Long, Long, Long)].head()
    assert(r._1 > 0)
    // rebuild the graph and the 3 Luby rounds
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1).map(_._2.map(_._2).toSet)
    val cnt = scala.collection.mutable.Map[(Long, Long), Int]()
    op.foreach { parts =>
      val ps = parts.toSeq.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        cnt((ps(i), ps(j))) = cnt.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set())
    cnt.filter(_._2 >= 2).keys.foreach { case (a, b) =>
      nbrs(a) += b; nbrs(b) += a
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prio = nbrs.keys.map(n => n -> (BigInt(
      java.lang.Long.parseLong(md5hex(s"mis:$n").take(13), 16)) *
      1000000 + n)).toMap
    var und = nbrs.keySet.toSet
    var mis = Set.empty[Long]
    (1 to 3).foreach { _ =>
      val winners = und.filter { v =>
        val un = nbrs(v).intersect(und)
        un.isEmpty || un.forall(u => prio(v) > prio(u))
      }
      mis ++= winners
      val killed = winners.flatMap(nbrs)
      und = und -- winners -- killed
    }
    assert(r._1 === mis.size.toLong)
    assert(r._2 === und.size.toLong)
    assert(r._3 === mis.sum)
    // independence: no two MIS members are adjacent
    mis.foreach(v => assert(nbrs(v).intersect(mis).isEmpty, s"$v adjacent"))
    // maximality over decided nodes: every excluded, decided node has a
    // MIS neighbor
    (nbrs.keySet -- mis -- und).foreach(v =>
      assert(nbrs(v).intersect(mis).nonEmpty, s"$v has no MIS neighbor"))
  }
}
