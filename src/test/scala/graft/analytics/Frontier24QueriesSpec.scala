package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier24Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier24QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("p_length_batching: bucketing never increases padding waste") {
    val got = Frontier24Queries.queries("p_length_batching")(spark, sf)
      .select(col("strategy"), col("n_batches"), col("real_tokens"),
        col("padded_tokens"), col("waste_r"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("naive", "bucketed"))
    val (n, b) = (got("naive"), got("bucketed"))
    // identical real workload, identical batch count
    assert(n._2 === b._2)
    assert(n._3 === b._3)
    // the whole point: bucketing pads no more than naive order
    assert(b._4 <= n._4, s"bucketed ${b._4} > naive ${n._4}")
    assert(b._5 <= n._5 + 1e-9)
    // padding is always >= the real tokens
    assert(n._4 >= n._3 && b._4 >= b._3)
    // rebuild the bucketed padding exactly
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.toLowerCase
        .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        .split(" ").count(_.nonEmpty).toLong) }
    val sorted = toks.sortBy { case (id, tk) => (tk, id) }
    val expPadded = sorted.grouped(8)
      .map(g => g.map(_._2).max * g.length).sum
    assert(b._4 === expPadded, "bucketed padded tokens")
  }

  test("a48_control_chart flags exactly the beyond-3-sigma days") {
    val got = Frontier24Queries.queries("a48_control_chart")(spark, sf)
      .select(col("day"), col("value"), col("kind"))
      .as[(String, Long, String)].collect()
    val (limits, ooc) = got.partition(_._1 == "LIMITS")
    assert(limits.length === 1)
    // parse limits back from the summary row
    val kind = limits.head._3
    val cl = kind.split(" ")(0).stripPrefix("cl=").toDouble
    val ucl = kind.split(" ")(1).stripPrefix("ucl=").toDouble
    val lcl = kind.split(" ")(2).stripPrefix("lcl=").toDouble
    assert(lcl < cl && cl < ucl)
    assert(limits.head._2 === ooc.length.toLong, "summary count")
    // every flagged day genuinely breaches; every unflagged day doesn't
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("d"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect()
    val flagged = ooc.map(_._1).toSet
    daily.foreach { case (d, n) =>
      val breach = n > ucl || n < lcl
      assert(breach === flagged.contains(d), s"day $d n=$n")
    }
  }

  test("g_assortativity is a valid correlation on endpoint degrees") {
    val got = Frontier24Queries.queries("g_assortativity")(spark, sf)
      .select(col("n_directed_edges"), col("assortativity_r"))
      .as[(Long, Double)].collect().head
    assert(got._1 > 0 && got._1 % 2 === 0, "both orientations present")
    assert(got._2 >= -1.0 - 1e-9 && got._2 <= 1.0 + 1e-9)
    // driver-side rebuild
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val e0 = op.values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val e = e0 ++ e0.map(p => (p._2, p._1))
    val deg = e.groupBy(_._1).map { case (v, xs) => v -> xs.size }
    assert(got._1 === e.size.toLong)
    val xs = e.map(p => deg(p._1).toDouble)
    val ys = e.map(p => deg(p._2).toDouble)
    val n = e.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val r = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(got._2 - r) < 1e-4, s"r ${got._2} vs $r")
  }
}
