package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier15Queries pack + the st_topk_windowed
  * streaming entry (the driver oracle hash-checks exact values; these
  * specs pin meaning on sf0.001).
  */
class Frontier15QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x10_l_diversity flags exactly the homogeneous QI groups") {
    val got = Frontier15Queries.queries("x10_l_diversity")(spark, sf)
      .select(col("n_name"), col("c_mktsegment"), col("n_records"),
        col("l_distinct"), col("l3_ok"), col("top_share_r"))
      .as[(String, String, Long, Long, Boolean, Double)].collect()
    assert(got.nonEmpty)
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_orderpriority"))
      .as[(String, String, String)].collect()
      .groupBy(r => (r._1, r._2))
    assert(got.length === rows.size)
    got.foreach { case (n, seg, nr, l, ok, share) =>
      val grp = rows((n, seg))
      assert(nr === grp.length.toLong)
      val dist = grp.map(_._3).distinct.length
      assert(l === dist.toLong, s"($n,$seg) distinct")
      assert(ok === (dist >= 3))
      val top = grp.groupBy(_._3).values.map(_.size).max
      assert(math.abs(share - top.toDouble / grp.length) < 1e-6)
    }
  }

  test("dq_iqr_outliers counts exactly the rows outside Tukey fences") {
    val got = Frontier15Queries.queries("dq_iqr_outliers")(spark, sf)
      .select(col("c_mktsegment"), col("n_orders"), col("n_outliers"),
        col("outlier_checksum"), col("lo_fence_r"), col("hi_fence_r"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.length === 5)
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect().groupBy(_._1)
    def quantile(v: Array[Double], p: Double): Double = {
      val s = v.sorted; val h = (s.length - 1) * p
      val lo = s(h.toInt)
      if (h == h.toInt) lo else lo + (h - h.toInt) * (s(h.toInt + 1) - lo)
    }
    got.foreach { case (seg, n, nOut, ck, _, _) =>
      val grp = rows(seg)
      assert(n === grp.length.toLong)
      val ps = grp.map(_._3)
      val q1 = quantile(ps, 0.25); val q3 = quantile(ps, 0.75)
      val lo = q1 - 1.5 * (q3 - q1); val hi = q3 + 1.5 * (q3 - q1)
      val out = grp.filter(r => r._3 < lo || r._3 > hi)
      assert(nOut === out.length.toLong, s"$seg outlier count")
      assert(ck === out.map(_._2).sum, s"$seg checksum")
    }
  }

  test("ml_gbt_stumps round 2 strictly reduces training SSE") {
    val got = Frontier15Queries.queries("ml_gbt_stumps")(spark, sf)
      .select(col("rnd"), col("thr"), col("left_mean"), col("right_mean"),
        col("sse_m_r"))
      .as[(Int, Long, String, String, Double)].collect().sortBy(_._1)
    assert(got.length === 2)
    val Array(r1, r2) = got
    // boosting must help: the residual fit's SSE is strictly below the
    // first round's (equivalently, round 1's split was not already exact)
    assert(r2._5 < r1._5, s"sse ${r2._5} !< ${r1._5}")
    // round-2 leaf means are residual means — near zero relative to r1's
    assert(math.abs(BigDecimal(r2._3).toDouble) <
      math.abs(BigDecimal(r1._3).toDouble))
    // round 1's threshold is the brute-force argmin over month bins
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("bin"),
        col("o_totalprice").cast("decimal(18,4)").as("y"))
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (b, y) => (b, BigDecimal(y)) }
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
    def sse(xs: Seq[BigDecimal]): Double = {
      val n = xs.length
      val s = xs.sum; val q = xs.map(x => x * x).sum
      (q - s * s / n).toDouble
    }
    val cands = bins.indices.dropRight(1).map { i =>
      val thr = bins(i)._1
      val left = rows.filter(_._1 <= thr).map(_._2).toSeq
      val right = rows.filter(_._1 > thr).map(_._2).toSeq
      thr -> (sse(left) + sse(right))
    }
    val bestThr = cands.minBy { case (t, v) => (v, t) }._1
    assert(r1._2 === bestThr, s"round-1 threshold")
  }

  test("st_topk_windowed matches the batch daily top-2 with tie-breaks") {
    val got = StreamingQueries.queries("st_topk_windowed")(spark, sf)
      .select(col("day_window").cast("long"), col("rnk"), col("event_type"),
        col("n_events"))
      .as[(Long, Int, String, Long)].collect()
    assert(got.nonEmpty)
    val days = got.groupBy(_._1)
    days.values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length))
      assert(rs.length <= 2)
    }
    // parity with a batch recompute
    val batch = graft.Tables.load(spark, sf, "events")
      .select(expr("timestamp_micros(ts div 1000)").as("tsx"),
        col("event_type"))
      .groupBy(date_trunc("day", col("tsx")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .groupBy(_._1.getTime / 1000)
    got.groupBy(_._1).foreach { case (day, rs) =>
      val exp = batch(day).sortBy(r => (-r._3, r._2)).take(2)
      val expSet = exp.map(r => (r._2, r._3)).toSeq
      val gotSet = rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotSet === expSet, s"day $day")
    }
  }
}
