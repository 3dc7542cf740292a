package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier12Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier12QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ev_feature_snapshot features are strictly point-in-time-correct") {
    val got = Frontier12Queries.queries("ev_feature_snapshot")(spark, sf)
      .select(col("user_id"), col("n_purchases"), col("sum_prior_clicks"),
        col("sum_prior_views"), col("sum_prior_errors"), col("min_gap_s"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1)
    got.foreach { case (uid, np, sc, sv, se, mg) =>
      val seq = ev(uid).sortBy(e => (e._4, e._2))
      val purchases = seq.zipWithIndex.filter(_._1._3 == "purchase")
      assert(np === purchases.length.toLong)
      // rebuild prior counts per purchase by strict prefix
      var expC = 0L; var expV = 0L; var expE = 0L
      var gaps = List.empty[Long]
      purchases.foreach { case (p, idx) =>
        val prior = seq.take(idx)
        expC += prior.count(_._3 == "click")
        expV += prior.count(_._3 == "view")
        expE += prior.count(_._3 == "error")
        prior.reverse.find(_._3 == "purchase")
          .foreach(prev => gaps ::= p._4 - prev._4)
      }
      assert(sc === expC && sv === expV && se === expE, s"user $uid")
      val expMg = if (gaps.isEmpty) -1L else gaps.min
      assert(mg === expMg, s"user $uid gap")
    }
  }

  test("x9_integrity_checksum is order-insensitive and tamper-evident") {
    val got = Frontier12Queries.queries("x9_integrity_checksum")(spark, sf)
      .select(col("tbl"), col("n_rows"), col("content_sum"))
      .as[(String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set("nation", "region", "customer", "supplier"))
    // row counts match the tables
    Seq("nation", "region", "customer", "supplier").foreach { t =>
      assert(got(t)._2 === spark.read.parquet(s"$sf/$t.parquet").count())
    }
    // order-insensitivity: recompute the nation checksum from a shuffled
    // driver-side rebuild and compare
    def sha256hex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).as[(Int, String)].collect()
    val sum = scala.util.Random.shuffle(rows.toList)
      .map { case (k, n) =>
        BigInt(java.lang.Long.parseLong(sha256hex(s"$k|$n").take(15), 16))
      }.sum
    assert(got("nation")._3 === sum.toString)
    // tamper evidence: flipping one row changes the sum
    val tampered = sum - BigInt(java.lang.Long.parseLong(
      sha256hex(s"${rows.head._1}|${rows.head._2}").take(15), 16)) +
      BigInt(java.lang.Long.parseLong(
        sha256hex(s"${rows.head._1}|XX${rows.head._2}").take(15), 16))
    assert(tampered.toString !== got("nation")._3)
  }

  test("ev_entropy_rate buckets match a driver-side entropy rebuild") {
    val got = Frontier12Queries.queries("ev_entropy_rate")(spark, sf)
      .select(col("bucket"), col("n_users"), col("id_checksum"))
      .as[(Long, Long, Long)].collect()
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = ev.flatMap { case (uid, rows) =>
      val seq = rows.sortBy(e => (e._4, e._2)).map(_._3)
      val trans = seq.zip(seq.tail)
      if (trans.isEmpty) None
      else {
        val nt = trans.length.toDouble
        val h = trans.groupBy(identity).map { case ((a, _), xs) =>
          val na = trans.count(_._1 == a).toDouble
          val p = xs.length / na
          r6((na / nt) * p * -math.log(p))
        }.sum
        Some(uid -> math.floor(h / 0.25).toLong)
      }
    }
    val expBuckets = exp.groupBy(_._2).map { case (b, us) =>
      b -> (us.size.toLong, us.keys.sum)
    }
    assert(got.length === expBuckets.size)
    got.foreach { case (b, n, ck) =>
      val (en, eck) = expBuckets(b)
      assert(n === en, s"bucket $b count")
      assert(ck === eck, s"bucket $b checksum")
    }
  }
}
