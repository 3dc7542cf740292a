package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier4Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001 via
  * full driver-side rebuilds of both algorithms).
  */
class Frontier4QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ml_kmeans_embed matches a driver-side Lloyd rebuild") {
    val got = Frontier4Queries.queries("ml_kmeans_embed")(spark, sf)
      .select(col("cid"), col("n_vecs"), col("inertia_r"), col("cnorm_r"))
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(f => r6(f.toDouble)) }.toMap
    assert(got.map(_._2).sum === vecs.size.toLong)
    // exact rebuild: same seeds, same 3 rounds, same tie-breaks
    val seeds = vecs.keys.toSeq.sortBy(id => (md5hex(s"km:$id"), id)).take(8)
    var cent: Map[Int, Array[Double]] =
      seeds.zipWithIndex.map { case (id, i) => (i + 1) -> vecs(id) }.toMap
    def assign(c: Map[Int, Array[Double]]): Map[Long, (Int, Double)] =
      vecs.map { case (id, v) =>
        val scored = c.toSeq.map { case (cid, cv) =>
          val d2 = v.indices.map { i =>
            val d = v(i) - cv(i); d * d }.sum
          (cid, d2)
        }.sortBy { case (cid, d2) => (d2, cid) }
        id -> scored.head
      }
    (1 to 3).foreach { _ =>
      val asg = assign(cent)
      cent = asg.groupBy(_._2._1).map { case (cid, members) =>
        val ids = members.keys.toSeq
        val mean = Array.tabulate(64)(i =>
          r6(ids.map(vecs(_)(i)).sum / ids.size))
        cid -> mean
      }
    }
    val fin = assign(cent)
    val exp = fin.groupBy(_._2._1).map { case (cid, m) =>
      (cid, m.size.toLong, m.values.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    assert(got.map(g => (g._1, g._2)) === exp.map(e => (e._1, e._2)))
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-3, s"cid ${g._1} inertia")
    }
    // centroid norms consistent with the rebuilt centroids
    got.foreach { case (cid, _, _, cn) =>
      val expN = cent(cid).map(x => x * x).sum
      assert(math.abs(cn - expN) < 1e-3, s"cid $cid cnorm $cn vs $expN")
    }
  }

  test("t_nb_classify matches a driver-side Naive Bayes rebuild") {
    val got = Frontier4Queries.queries("t_nb_classify")(spark, sf)
      .select(col("true_lang"), col("pred_lang"), col("n_docs"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def norm(t: String): String =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, lang, text) =>
        val bucket = java.lang.Long.parseLong(
          md5hex(id.toString).take(8), 16) % 100
        (id, lang, norm(text).split(" ").filter(_.nonEmpty), bucket)
      }
    val train = docs.filter(_._4 < 80)
    val test0 = docs.filter(_._4 >= 80)
    assert(got.values.sum === test0.length.toLong)
    val langs = train.map(_._2).distinct.sorted
    val vocabV = train.flatMap(_._3).distinct.length
    val prior = langs.map(c => c ->
      r6(math.log(train.count(_._2 == c).toDouble / train.length))).toMap
    val tokCounts = train.groupBy(_._2).map { case (c, ds) =>
      c -> ds.flatMap(_._3).groupBy(identity).map { case (t, xs) =>
        t -> xs.length }
    }
    val totC = train.groupBy(_._2).map { case (c, ds) =>
      c -> ds.map(_._3.length).sum }
    val exp = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    test0.foreach { case (_, trueLang, toks, _) =>
      val best = langs.map { c =>
        val denom = (totC(c) + vocabV).toDouble
        val s = prior(c) + toks.map(t =>
          r6(math.log((tokCounts(c).getOrElse(t, 0) + 1) / denom))).sum
        (c, s)
      }.sortBy { case (c, sc) => (-sc, c) }.head._1
      exp((trueLang, best)) += 1L
    }
    assert(got === exp.toMap, s"got $got\nexp $exp")
  }
}
