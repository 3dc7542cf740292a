package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier14Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier14QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("eval_bradley_terry shares sum to 1 and order matches win rates") {
    val got = Frontier14Queries.queries("eval_bradley_terry")(spark, sf)
      .select(col("priority"), col("strength"), col("share_r"))
      .as[(String, String, Double)].collect()
    assert(got.length === 5)
    val shareSum = got.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    got.foreach { case (_, st, sh) =>
      assert(BigDecimal(st) > 0, "strengths positive")
      assert(sh > 0 && sh < 1)
    }
    // BT strengths must rank consistently with overall pairwise win rate:
    // the item with the highest total-win share should get the top strength
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,4)").as("tp"),
        col("o_orderkey"))
      .as[(Long, String, java.math.BigDecimal, Long)].collect()
      .groupBy(_._1)
    val winCounts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val playCounts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    o.values.foreach { os =>
      for {
        i <- os.indices; j <- os.indices
        if os(i)._4 < os(j)._4
        a = os(i); b = os(j)
        if a._2 != b._2 && a._3.compareTo(b._3) != 0
      } {
        val (w, l) = if (a._3.compareTo(b._3) > 0) (a._2, b._2)
                     else (b._2, a._2)
        winCounts(w) += 1; playCounts(w) += 1; playCounts(l) += 1
      }
    }
    val winRate = playCounts.keys
      .map(p => p -> winCounts(p).toDouble / playCounts(p)).toMap
    val topByBt = got.maxBy(r => BigDecimal(r._2))._1
    val topByWr = winRate.maxBy(_._2)._1
    assert(topByBt === topByWr,
      s"BT top $topByBt should match win-rate top $topByWr")
  }

  test("w22_sax words use the 4-letter alphabet over balanced z-scores") {
    val got = Frontier14Queries.queries("w22_sax")(spark, sf)
      .select(col("r_name"), col("n_quarters"), col("sax_word"))
      .as[(String, Long, String)].collect()
    assert(got.length === 5)
    got.foreach { case (r, nq, word) =>
      assert(word.matches("[abcd]+"), s"$r word $word")
      // one symbol per quarter
      val months = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .join(spark.read.parquet(s"$sf/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .join(spark.read.parquet(s"$sf/region.parquet"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === r)
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mon"))
        .distinct().as[Long].collect()
      val q = months.map(m => (m - months.min) / 3).distinct.length
      assert(word.length === q && nq === q.toLong, s"$r quarters")
      // z-normalized series must hit both halves of the alphabet
      assert(word.exists(c => c == 'a' || c == 'b'), s"$r below-mean")
      assert(word.exists(c => c == 'c' || c == 'd'), s"$r above-mean")
    }
  }

  test("d_substring_spans finds cross-doc duplicated 8-gram spans") {
    val got = Frontier14Queries.queries("d_substring_spans")(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens"))
      .as[(Long, Int, Long, Long)].collect()
    assert(got.nonEmpty, "sf0.001 corpus has near-duplicate docs")
    got.foreach { case (id, nt, ns, dt) =>
      assert(ns >= 1)
      assert(dt >= 8 * ns, s"doc $id: each span covers >= 8 tokens")
      assert(dt <= nt, s"doc $id: coverage bounded by doc length")
    }
    // ground truth by brute force: every doc sharing a full 8-token
    // window string with another doc must appear
    def toks(text: String): Array[String] =
      text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, tx) => id -> toks(tx) }
    val gramDocs = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, ts) =>
      ts.sliding(8).filter(_.length == 8).map(_.mkString(" "))
        .foreach(g => gramDocs.getOrElseUpdate(g,
          scala.collection.mutable.Set.empty) += id)
    }
    val expDocs = gramDocs.values.filter(_.size >= 2).flatten.toSet
    assert(got.map(_._1).toSet === expDocs)
  }
}
