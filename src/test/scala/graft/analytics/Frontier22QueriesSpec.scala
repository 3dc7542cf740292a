package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier22Queries pack + st_static_enrich
  * (the driver oracle hash-checks exact values; these specs pin
  * meaning on sf0.001).
  */
class Frontier22QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t_style_fingerprint Delta is a symmetric non-negative distance") {
    val got = Frontier22Queries.queries("t_style_fingerprint")(spark, sf)
      .select(col("rnk"), col("sa"), col("sb"), col("delta_r"))
      .as[(Int, String, String, Double)].collect()
    assert(got.nonEmpty && got.length >= 5)
    got.foreach { case (_, sa, sb, d) =>
      assert(sa < sb, "canonical pair order")
      assert(d >= 0.0, s"($sa,$sb) delta $d")
    }
    // non-decreasing along ranks (closest pairs first)
    got.sortBy(_._1).map(_._4).sliding(2).foreach {
      case Array(x, y) => assert(x <= y)
      case _ => ()
    }
    // the best pair must beat or equal the average of emitted deltas
    val mean = got.map(_._4).sum / got.length
    assert(got.minBy(_._4)._4 <= mean)
  }

  test("ann_range_search returns exactly the >= tau cosine neighbors") {
    val got = Frontier22Queries.queries("ann_range_search")(spark, sf)
      .select(col("qid"), col("n_neighbors"), col("id_checksum"),
        col("max_cos"))
      .as[(Long, Long, Long, String)].collect()
    assert(got.length === 5)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val frozen = emb.map { case (k, v) => k -> v.map(f => r6(f.toDouble)) }
    got.foreach { case (qid, n, ck, mc) =>
      val q = frozen(qid)
      val neigh = frozen.keys.filter(_ != qid).flatMap { vid =>
        val x = frozen(vid)
        val dot = q.zip(x).map { case (a, b) => a * b }.sum
        val nq = q.map(a => a * a).sum
        val nx = x.map(a => a * a).sum
        val cos = r6((dot.toDouble /
          math.sqrt((nx * nq).toDouble)))
        if (cos >= BigDecimal("0.2")) Some(vid -> cos) else None
      }.toSeq
      assert(n === neigh.length.toLong, s"q$qid count")
      assert(ck === neigh.map(_._1).sum, s"q$qid checksum")
      assert(BigDecimal(mc) === neigh.map(_._2).max, s"q$qid max cos")
    }
  }

  test("st_static_enrich matches the batch baseline-comparison rebuild") {
    val got = StreamingQueries.queries("st_static_enrich")(spark, sf)
      .select(col("day_window").cast("long"), col("n_events"),
        col("n_above_baseline"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("value"))
      .as[(Long, Long, Double)].collect()
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val baseline = ev.groupBy(_._1).map { case (u, xs) =>
      u -> r6(xs.map(x => BigDecimal(x._3).setScale(4,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.length)
    }
    val byDay = ev.groupBy(e => e._2 - e._2 % 86400000000L)
    assert(got.length === byDay.size)
    got.foreach { case (daySec, n, above) =>
      val xs = byDay(daySec * 1000000L)
      assert(n === xs.length.toLong, s"day $daySec size")
      val expAbove = xs.count(x => BigDecimal(x._3).setScale(4,
        BigDecimal.RoundingMode.HALF_UP) > baseline(x._1))
      assert(above === expAbove.toLong, s"day $daySec above-baseline")
    }
  }
}
