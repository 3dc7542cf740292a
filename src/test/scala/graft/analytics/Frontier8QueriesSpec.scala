package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier8Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier8QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("t_rouge_pairs matches a driver-side ROUGE rebuild") {
    val got = Frontier8Queries.queries("t_rouge_pairs")(spark, sf)
      .select(col("lang"), col("n_pairs"), col("rouge1_f1_r"),
        col("rouge2_f1_r"))
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    def norm(t: String): Array[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, l, t) => id -> (l, norm(t)) }.toMap
    def multiset(xs: Seq[String]): Map[String, Int] =
      xs.groupBy(identity).map { case (k, v) => k -> v.length }
    def f1(a: Seq[String], b: Seq[String]): Double = {
      if (a.isEmpty && b.isEmpty) return 0.0
      val (ma, mb) = (multiset(a), multiset(b))
      val ov = ma.map { case (g, c) => math.min(c, mb.getOrElse(g, 0)) }.sum
      r6(2.0 * ov / (a.length + b.length))
    }
    def bigrams(t: Seq[String]): Seq[String] =
      t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    got.foreach { case (lang, nPairs, g1, g2) =>
      val pairs = docs.toSeq.flatMap { case (id, (l, toks)) =>
        docs.get(id + 1) match {
          case Some((l2, toks2)) if l == lang && l2 == lang =>
            Some((toks, toks2))
          case _ => None
        }
      }
      assert(nPairs === pairs.length.toLong, s"$lang pair count")
      val e1 = pairs.map(p => f1(p._1, p._2)).sum / pairs.length
      val e2 = pairs.map(p => f1(bigrams(p._1), bigrams(p._2))).sum /
        pairs.length
      assert(math.abs(g1 - e1) < 1e-4, s"$lang rouge1 $g1 vs $e1")
      assert(math.abs(g2 - e2) < 1e-4, s"$lang rouge2 $g2 vs $e2")
      assert(g1 >= g2, s"$lang: unigram F1 must dominate bigram F1")
    }
  }

  test("w21_rolling_corr matches a windowed Pearson rebuild") {
    val got = Frontier8Queries.queries("w21_rolling_corr")(spark, sf)
      .select(col("d"), col("x"), col("y"), col("corr7_r"))
      .as[(java.sql.Date, Long, Long, Option[Double])].collect()
      .sortBy(_._1.toString)
    assert(got.nonEmpty)
    // first 6 days have no correlation
    got.take(6).foreach(r => assert(r._4.isEmpty))
    got.zipWithIndex.drop(6).foreach { case ((d, _, _, c), i) =>
      val win = got.slice(i - 6, i + 1)
      val xs = win.map(_._2.toDouble); val ys = win.map(_._3.toDouble)
      val n = 7.0
      val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
      val den = math.sqrt(n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        math.sqrt(n * ys.map(y => y * y).sum - ys.sum * ys.sum)
      if (den == 0.0) assert(c.isEmpty)
      else {
        assert(c.isDefined, s"$d missing corr")
        assert(math.abs(c.get - num / den) < 1e-6, s"$d corr")
        assert(c.get >= -1.0 - 1e-9 && c.get <= 1.0 + 1e-9)
      }
    }
  }

  test("dq_reconciliation buckets orders by header-vs-lines gap") {
    val got = Frontier8Queries.queries("dq_reconciliation")(spark, sf)
      .select(col("bucket"), col("n_orders"), col("total_gap_r"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(got.values.map(_._1).sum === nOrders)
    assert(got.keySet.subsetOf(
      Set("match", "minor_gap", "major_gap", "missing_lines")))
    // rebuild the bucket counts
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("lt"))
    val joined = spark.read.parquet(s"$sf/orders.parquet")
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_totalprice"), col("lt"))
      .as[(Double, Option[Double])].collect()
    val exp = joined.groupBy { case (hdr, lt) =>
      lt match {
        case None => "missing_lines"
        case Some(l) =>
          val g = math.abs(l - hdr) / hdr
          if (g <= 0.0001) "match"
          else if (g <= 0.01) "minor_gap" else "major_gap"
      }
    }.map { case (k, v) => k -> v.size.toLong }
    // double-vs-decimal rounding can move borderline orders; totals per
    // bucket must agree within a tiny count
    exp.foreach { case (k, n) =>
      val gn = got.get(k).map(_._1).getOrElse(0L)
      assert(math.abs(gn - n) <= 2, s"$k: $gn vs $n")
    }
  }
}
