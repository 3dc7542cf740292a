package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier13Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier13QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def normToks(text: String): Array[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
      .trim.split(" ").filter(_.nonEmpty)

  test("t_bleu_pairs matches a driver-side BLEU-2 rebuild") {
    val got = Frontier13Queries.queries("t_bleu_pairs")(spark, sf)
      .select(col("lang"), col("n_pairs"), col("bleu2_r"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, lang, text) => (id, lang, normToks(text)) }
    val byId = docs.map(d => d._1 -> d).toMap
    def counts(toks: Array[String], n: Int): Map[String, Int] =
      (if (n == 1) toks.toSeq else toks.toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val perLang = docs.flatMap { case (id, lang, toks) =>
      byId.get(id + 1).filter(_._2 == lang).map { case (_, _, ref) =>
        val c1 = counts(toks, 1); val r1 = counts(ref, 1)
        val c2 = counts(toks, 2); val r2 = counts(ref, 2)
        val ov1 = c1.map { case (g, c) => math.min(c, r1.getOrElse(g, 0)) }.sum
        val ov2 = c2.map { case (g, c) => math.min(c, r2.getOrElse(g, 0)) }.sum
        val la1 = toks.length; val lb1 = ref.length
        val la2 = c2.values.sum
        val bleu =
          if (ov1 > 0 && ov2 > 0) {
            val bp = if (la1 >= lb1) 1.0
                     else math.exp(1.0 - lb1.toDouble / la1.toDouble)
            r6(bp * math.sqrt((ov1.toDouble / la1) * (ov2.toDouble / la2)))
          } else BigDecimal(0)
        lang -> bleu
      }
    }.groupBy(_._1)
    assert(got.keySet === perLang.keySet)
    perLang.foreach { case (lang, xs) =>
      val (_, n, mean) = got(lang)
      assert(n === xs.length.toLong, s"lang $lang pair count")
      val expMean = r6((xs.map(_._2).sum / xs.length).toDouble)
      assert(r6(mean) === expMean, s"lang $lang mean bleu")
    }
  }

  test("eval_pass_at_k matches the exact combinatorial estimator") {
    val got = Frontier13Queries.queries("eval_pass_at_k")(spark, sf)
      .select(col("k"), col("n_problems"), col("total_successes"),
        col("mean_pass_r"))
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1, 3, 5))
    val probs = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
      .as[(Long, Long, Long)].collect()
    def choose(n: Long, k: Int): BigInt =
      if (k > n) BigInt(0)
      else (0 until k).map(i => BigInt(n - i)).product /
        (1 to k).map(BigInt(_)).product
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    Seq(1, 3, 5).foreach { k =>
      val el = probs.filter(_._2 >= k)
      val vals = el.map { case (_, n, c) =>
        val ratio = choose(n - c, k).toDouble / choose(n, k).toDouble
        r6(1.0 - ratio)
      }
      val (_, np, ts, mean) = got(k)
      assert(np === el.length.toLong, s"k=$k problems")
      assert(ts === el.map(_._3).sum, s"k=$k successes")
      assert(r6(mean) === r6((vals.sum / vals.length).toDouble), s"k=$k mean")
      // pass@1 must equal the plain success rate c/n averaged over problems
      if (k == 1) {
        val exp = el.map { case (_, n, c) => r6(c.toDouble / n) }
        assert(r6(mean) === r6((exp.sum / exp.length).toDouble))
      }
    }
    // monotonicity: pass@1 <= pass@3 <= pass@5 (more attempts can only help)
    assert(got(1)._4 <= got(3)._4 + 1e-9)
    assert(got(3)._4 <= got(5)._4 + 1e-9)
  }

  test("g_jaccard_neighbors scores are valid Jaccard values on new links") {
    val got = Frontier13Queries.queries("g_jaccard_neighbors")(spark, sf)
      .select(col("rnk"), col("pa"), col("pb"), col("n_common"),
        col("jac_r"))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 20)
    // ranks start at 1, are non-decreasing with jac desc
    assert(got.head._1 === 1)
    got.sliding(2).foreach { case Array(x, y) =>
      assert(x._5 >= y._5, "scores non-increasing with rank")
    }
    // pairs are canonical (pa < pb), Jaccard in (0, 1]
    got.foreach { case (_, pa, pb, nc, j) =>
      assert(pa < pb); assert(nc >= 1); assert(j > 0.0 && j <= 1.0)
    }
    // no scored pair is an existing edge (>=2 shared orders)
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1)
    val edges = op.values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    // (collect{...=> e} on a Map would rebuild a Map keyed by e._1 and
    //  silently dedupe — filter+keySet keeps every qualifying pair)
    got.foreach { case (_, pa, pb, _, _) =>
      assert(!edges.contains((pa, pb)), s"($pa,$pb) already linked")
    }
  }
}
