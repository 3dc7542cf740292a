package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier16Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier16QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("i24_scd4 current+history tile each customer's timeline exactly") {
    val got = Frontier16Queries.queries("i24_scd4")(spark, sf)
      .select(col("tbl"), col("o_custkey"), col("priority"),
        col("valid_from").cast("string"), col("valid_to").cast("string"))
      .as[(String, Long, String, String, String)].collect()
    val byCust = got.groupBy(_._2)
    // exactly one current row per customer with an open interval
    byCust.foreach { case (ck, rows) =>
      val cur = rows.filter(_._1 == "current")
      assert(cur.length === 1, s"cust $ck current rows")
      assert(cur.head._5 === "9999-12-31")
      // history intervals chain: each valid_to equals the next valid_from
      val ordered = rows.sortBy(_._4)
      ordered.sliding(2).foreach {
        case Array(x, y) => assert(x._5 === y._4,
          s"cust $ck interval chain ${x._5} -> ${y._4}")
        case _ => ()
      }
      // consecutive versions always change priority
      ordered.sliding(2).foreach {
        case Array(x, y) => assert(x._3 !== y._3, s"cust $ck no-op version")
        case _ => ()
      }
    }
    // current priority equals the latest order's priority
    val latest = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority"))
      .as[(Long, String)].collect().toMap
    byCust.foreach { case (ck, rows) =>
      assert(rows.find(_._1 == "current").get._3 === latest(ck))
    }
  }

  test("ev_markov_steady iterations preserve probability mass") {
    val got = Frontier16Queries.queries("ev_markov_steady")(spark, sf)
      .select(col("event_type"), col("pi1"), col("pi2"), col("pi3"))
      .as[(String, String, String, String)].collect()
    assert(got.length === 5)
    Seq[((String, String, String, String)) => String](_._2, _._3, _._4)
      .zipWithIndex.foreach { case (f, i) =>
        val mass = got.map(r => BigDecimal(f(r))).sum
        assert((mass - 1).abs < BigDecimal("0.001"),
          s"iteration ${i + 1} mass $mass")
      }
    // successive iterations contract toward the stationary point:
    // dist(pi2, pi3) <= dist(pi1, pi2) in L1
    val d12 = got.map(r => (BigDecimal(r._2) - BigDecimal(r._3)).abs).sum
    val d23 = got.map(r => (BigDecimal(r._3) - BigDecimal(r._4)).abs).sum
    assert(d23 <= d12 + BigDecimal("0.0001"), s"L1 $d23 > $d12")
  }

  test("t_keyphrase_rake scores equal the sum of member word scores") {
    val got = Frontier16Queries.queries("t_keyphrase_rake")(spark, sf)
      .select(col("rnk"), col("phrase"), col("n_occurrences"), col("len"),
        col("score_r"))
      .as[(Int, String, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length >= 15)
    got.foreach { case (_, phrase, n, len, score) =>
      val words = phrase.split(" ")
      assert(words.length === len)
      assert(n >= 1)
      assert(score > 0)
      assert(!words.exists(Seq("the", "a", "an", "of", "and", "to", "in",
        "is", "it", "that", "as", "for", "on", "with", "was", "by", "at")
        .contains(_)), s"stopword inside phrase '$phrase'")
    }
    // driver-side RAKE rebuild: word deg/freq over stopword-split runs
    val stop = Set("the", "a", "an", "of", "and", "to", "in", "is", "it",
      "that", "as", "for", "on", "with", "was", "by", "at")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val phrasesAll = docs.flatMap { case (_, tx) =>
      val toks = tx.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
      // split into maximal non-stopword runs
      val runs = scala.collection.mutable.ListBuffer
        .empty[scala.collection.mutable.ListBuffer[String]]
      toks.foreach { w =>
        if (stop(w)) { if (runs.isEmpty || runs.last.nonEmpty)
          runs += scala.collection.mutable.ListBuffer.empty }
        else {
          if (runs.isEmpty) runs += scala.collection.mutable.ListBuffer.empty
          runs.last += w
        }
      }
      runs.map(_.toList).filter(_.nonEmpty)
    }
    val freq = phrasesAll.flatten.groupBy(identity).map {
      case (w, xs) => w -> xs.length }
    val deg = phrasesAll.flatMap(p => p.map(w => w -> p.length))
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wscore = freq.keys.map(w =>
      w -> r6(deg(w).toDouble / freq(w))).toMap
    got.foreach { case (_, phrase, _, _, score) =>
      val exp = phrase.split(" ").map(wscore).sum
      assert((BigDecimal(score) - exp).abs <= BigDecimal("0.0001"),
        s"phrase '$phrase' score $score != $exp")
    }
  }
}
