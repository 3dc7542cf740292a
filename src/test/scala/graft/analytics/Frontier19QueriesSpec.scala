package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier19Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier19QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t_perplexity_eval scores held-out text with train-only counts") {
    val got = Frontier19Queries.queries("t_perplexity_eval")(spark, sf)
      .select(col("lang"), col("n_eval_bigrams"), col("ppl_r"))
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (lang, n, ppl) =>
      assert(n > 0, lang)
      assert(ppl > 1.0, s"$lang perplexity $ppl must exceed 1")
    }
    // vocab bound: add-one smoothing keeps perplexity <= V + max(c1)
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val trainToks = docs.filter(_._1 % 2 == 0).flatMap(d => toks(d._3))
    val v = trainToks.distinct.length
    // worst case for one bigram is P = 1/(c1+V) >= 1/(n_train+V)
    val bound = trainToks.length + v.toDouble
    got.foreach { case (lang, _, ppl) =>
      assert(ppl <= bound, s"$lang $ppl > $bound")
    }
    // eval side uses only odd docs: recompute one language's count
    val lang0 = got.head._1
    val expN = docs.filter(d => d._1 % 2 == 1 && d._2 == lang0)
      .map(d => math.max(0, toks(d._3).length - 1)).sum
    assert(got.head._2 === expN.toLong, s"$lang0 eval bigram count")
  }

  test("g_hits authorities are the mutual-reinforcement argmax parts") {
    val got = Frontier19Queries.queries("g_hits")(spark, sf)
      .select(col("rnk"), col("l_partkey"), col("authority"))
      .as[(Int, Long, String)].collect()
    assert(got.nonEmpty && got.length >= 10)
    assert(got.head._1 === 1)
    // authority scores are a normalized distribution slice: in (0,1],
    // non-increasing along ranks
    val scores = got.map(r => BigDecimal(r._3))
    scores.foreach(a => assert(a > 0 && a <= 1))
    scores.sliding(2).foreach { case Array(x, y) => assert(x >= y)
      case _ => () }
    // driver-side rebuild of the 2-round HITS recursion
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def l1(m: Map[Long, BigDecimal]): Map[Long, BigDecimal] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> r9((v / tot).toDouble) }
    }
    val a1 = l1(e.groupBy(_._2).map { case (p, xs) =>
      p -> BigDecimal(xs.length) })
    val h1 = l1(e.groupBy(_._1).map { case (c, xs) =>
      c -> xs.map(x => a1(x._2)).sum })
    val a2 = l1(e.groupBy(_._2).map { case (p, xs) =>
      p -> xs.map(x => h1(x._1)).sum })
    val expTop = a2.toSeq.sortBy { case (p, sc) => (-sc, p) }.take(10)
    got.take(10).zip(expTop).foreach { case ((_, p, a), (ep, ea)) =>
      assert(p === ep, s"authority order: $p vs $ep")
      assert((BigDecimal(a) - ea).abs <= BigDecimal("0.000000002"),
        s"score $a vs $ea")
    }
  }

  test("ann_mips_topk augmented-L2 ranking equals direct inner-product") {
    val got = Frontier19Queries.queries("ann_mips_topk")(spark, sf)
      .select(col("qid"), col("rnk"), col("vec_id"), col("inner_product"))
      .as[(Long, Int, Long, String)].collect()
    assert(got.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def frozen(x: Array[Float]): Array[BigDecimal] =
      x.map(f => r6(f.toDouble))
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length === 10)
      val q = frozen(emb(qid))
      // brute-force inner products over the frozen dims
      val dots = emb.keys.filter(_ > 3).map { vid =>
        val x = frozen(emb(vid))
        vid -> q.zip(x).map { case (a, b) => a * b }.sum
      }.toSeq
      val expTop = dots.sortBy { case (v, d) => (-d, v) }.take(10)
      rows.sortBy(_._2).zip(expTop).foreach {
        case ((_, _, vid, ip), (evid, edot)) =>
          assert(vid === evid, s"q$qid order")
          assert(BigDecimal(ip) === edot, s"q$qid dot $ip vs $edot")
      }
    }
  }
}
