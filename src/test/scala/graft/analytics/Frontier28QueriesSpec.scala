package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier28Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier28QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("d_dedup_savings reconciles with a driver-side hash dedup") {
    val got = Frontier28Queries.queries("d_dedup_savings")(spark, sf)
      .select(col("source"), col("n_docs"), col("n_removed"),
        col("chars_removed"), col("removal_rate_r"))
      .as[(String, Long, Long, Long, Double)].collect()
    val (all, per) = got.partition(_._1 == "ALL")
    assert(all.length === 1)
    assert(per.map(_._2).sum === all.head._2)
    assert(per.map(_._3).sum === all.head._3)
    assert(per.map(_._4).sum === all.head._4)
    // driver-side rebuild on normalized text
    def norm(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .as[(Long, String, Long, String)].collect()
    val byHash = docs.groupBy(d => norm(d._4))
    val removed = byHash.values.flatMap { grp =>
      val keeper = grp.minBy(_._1)._1
      grp.filter(_._1 != keeper)
    }.toSeq
    assert(all.head._3 === removed.length.toLong)
    assert(all.head._4 === removed.map(_._3).sum)
    val exp = removed.length.toDouble / docs.length
    assert(math.abs(all.head._5 - exp) < 1e-6)
  }

  test("t_pmi_pairs matches a driver-side PMI rebuild") {
    val got = Frontier28Queries.queries("t_pmi_pairs")(spark, sf)
      .select(col("rnk"), col("a"), col("b"), col("cab"), col("pmi_r"))
      .as[(Int, String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().map(toks)
    val all = docs.flatten
    val n = all.length.toDouble
    val uni = all.groupBy(identity).map { case (w, x) => w -> x.length }
    val pairCounts = docs.flatMap(ts => ts.zip(ts.tail).map {
      case (x, y) => if (x <= y) (x, y) else (y, x)
    }).groupBy(identity).map { case (p, xs) => p -> xs.length }
      .filter(_._2 >= 5)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (_, a, b, cab, pmi) =>
      assert(pairCounts((a, b)) === cab.toInt, s"($a,$b) count")
      val exp = r6(math.log(n * cab / (uni(a).toDouble * uni(b))))
      assert(math.abs(pmi - exp) < 1e-5, s"($a,$b) pmi $pmi vs $exp")
    }
    // the reported top-1 really is the max PMI among qualifying pairs
    val expBest = pairCounts.map { case ((a, b), c) =>
      (a, b, r6(math.log(n * c / (uni(a).toDouble * uni(b)))))
    }.maxBy { case (a, b, p) => (p, -a.hashCode) }._3
    assert(math.abs(got.minBy(_._1)._5 - expBest) < 1e-5)
  }

  test("ev_hourly_profile shares sum to 1 with one peak ratio") {
    val got = Frontier28Queries.queries("ev_hourly_profile")(spark, sf)
      .select(col("hr"), col("n_events"), col("share_r"),
        col("peak_hour"), col("peak_trough_r"))
      .as[(Long, Long, Double, Boolean, Double)].collect()
    assert(got.length <= 24 && got.nonEmpty)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-3)
    assert(got.map(_._2).sum ===
      graft.Tables.load(spark, sf, "events").count())
    val peaks = got.filter(_._4)
    assert(peaks.nonEmpty)
    val mx = got.map(_._2).max; val mn = got.map(_._2).min
    peaks.foreach(p => assert(p._2 === mx))
    got.foreach(r =>
      assert(math.abs(r._5 - mx.toDouble / mn) < 1e-4))
  }
}
