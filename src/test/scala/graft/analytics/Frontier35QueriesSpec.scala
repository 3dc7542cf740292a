package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier35Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier35QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t_ngram_novelty decile totals match a sequential walk") {
    val got = Frontier35Queries.queries("t_ngram_novelty")(spark, sf)
      .select(col("decile"), col("n_docs"), col("n_grams"),
        col("n_novel"), col("novelty_r"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val perDoc = docs.map { case (id, tx) =>
      val gs = toks(tx).sliding(4).filter(_.length == 4)
        .map(_.mkString(" ")).toSeq
      var novel = 0
      gs.foreach { g => if (!seen(g)) { seen += g; novel += 1 } }
      (id, gs.length.toLong, novel.toLong)
    }.filter(_._2 > 0)
    assert(got.map(_._3).sum === perDoc.map(_._2).sum)
    assert(got.map(_._4).sum === perDoc.map(_._3).sum)
    // the FIRST document is all-novel, so decile 0 has high novelty;
    // novelty cannot rise monotonically forever — the last decile is
    // below the first (diminishing returns on a corpus with overlap)
    assert(got.head._5 > got.last._5,
      s"novelty ${got.head._5} -> ${got.last._5}")
    got.foreach { case (_, _, ng, nv, r) =>
      assert(nv <= ng)
      assert(math.abs(r - nv.toDouble / ng) < 1e-6)
    }
  }

  test("ev_funnel_windows: wider windows never lose conversions") {
    val got = Frontier35Queries.queries("ev_funnel_windows")(spark, sf)
      .select(col("conv_window"), col("n1"), col("n2"), col("n3"),
        col("end_to_end_r"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("1h", "1d", "7d"))
    // n1 identical across windows (window only affects later stages)
    assert(got.values.map(_._2).toSet.size === 1)
    // monotonicity in the window
    assert(got("1h")._3 <= got("1d")._3 && got("1d")._3 <= got("7d")._3)
    assert(got("1h")._4 <= got("1d")._4 && got("1d")._4 <= got("7d")._4)
    // funnel shape within each window
    got.values.foreach { case (_, n1, n2, n3, r) =>
      assert(n2 <= n1 && n3 <= n2)
      assert(math.abs(r - n3.toDouble / n1) < 1e-6)
    }
  }

  test("g_powerlaw_fit alpha matches the closed-form MLE") {
    val got = Frontier35Queries.queries("g_powerlaw_fit")(spark, sf)
      .select(col("n_tail"), col("alpha_r"), col("alpha_se_r"))
      .as[(Long, Double, Double)].collect().head
    // rebuild degrees
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val edges = op.values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map(_._2.size).filter(_ >= 2).toSeq
    assert(got._1 === deg.length.toLong)
    val slt = deg.map(d => math.log(d / 1.5)).sum
    val alpha = 1.0 + deg.length / slt
    assert(math.abs(got._2 - alpha) < 1e-3, s"alpha ${got._2} vs $alpha")
    assert(got._2 > 1.0, "valid power-law exponent")
    assert(math.abs(got._3 - (alpha - 1) / math.sqrt(deg.length)) < 1e-3)
  }
}
