package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier33Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier33QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ann_hard_negatives ranks cross-label similarity correctly") {
    val got = Frontier33Queries.queries("ann_hard_negatives")(spark, sf)
      .select(col("qid"), col("rnk"), col("neg_id"), col("neg_cos"),
        col("best_pos_cos"), col("margin"))
      .as[(Long, Int, Long, String, String, String)].collect()
    assert(got.map(_._1).distinct.length === 5)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect()
      .toMap
    got.foreach { case (q, _, n, nc, bp, m) =>
      assert(labels(q) !== labels(n), "negatives cross labels")
      assert(BigDecimal(m) === BigDecimal(bp) - BigDecimal(nc),
        "margin identity")
    }
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length))
      // negatives ordered by similarity desc
      rs.sortBy(_._2).map(r => BigDecimal(r._4)).sliding(2).foreach {
        case Array(x, y) => assert(x >= y)
        case _ => ()
      }
      // best positive constant per probe
      assert(rs.map(_._5).distinct.length === 1)
    }
  }

  test("t_tokenizer_fertility: merges only ever shrink symbol counts") {
    val got = Frontier33Queries.queries("t_tokenizer_fertility")(spark, sf)
      .select(col("lang"), col("n_words"), col("chars_per_word_r"),
        col("fertility_r"), col("compression_r"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val totalWords = got.map(_._2).sum
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val expWords = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].collect().map(toks(_).length).sum
    assert(totalWords === expWords.toLong)
    got.foreach { case (lang, n, cpw, fert, comp) =>
      assert(n > 0, lang)
      // 3 merges can only reduce or keep symbol counts vs characters
      assert(fert <= cpw + 1e-9, s"$lang fertility $fert > chars $cpw")
      assert(comp <= 1.0 + 1e-9 && comp > 0)
      // merges genuinely fired on this corpus
      assert(fert < cpw, s"$lang merges had no effect")
    }
  }

  test("ev_activity_bitmap popcounts match distinct active weekdays") {
    val got = Frontier33Queries.queries("ev_activity_bitmap")(spark, sf)
      .select(col("wk"), col("n_users"), col("mean_active_days_r"),
        col("same_dow_overlap"), col("n_habitual"))
      .as[(Long, Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.length >= 4, "several weeks of data")
    val e = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .as[(Long, Long)].collect()
    val perUserWeek = e.map { case (u, d) => ((u, d / 7), d % 7) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    got.foreach { case (wk, nUsers, mean, _, _) =>
      val mine = perUserWeek.filter(_._1._2 == wk)
      assert(nUsers === mine.size.toLong, s"wk $wk users")
      val expMean = mine.values.map(_.size).sum.toDouble / mine.size
      assert(math.abs(mean - expMean) < 1e-6, s"wk $wk mean")
    }
    // habitual = >= 2 same-weekday active in consecutive weeks
    val byUser = perUserWeek.groupBy(_._1._1)
    val expHabitual = got.map(_._1).map { wk =>
      wk -> byUser.count { case (_, weeks) =>
        val cur = weeks.find(_._1._2 == wk).map(_._2)
        val prev = weeks.find(_._1._2 == wk - 1).map(_._2)
        cur.zip(prev).exists { case (c, p) => (c & p).size >= 2 }
      }
    }.toMap
    got.foreach { case (wk, _, _, _, nh) =>
      assert(nh === expHabitual(wk).toLong, s"wk $wk habitual")
    }
  }
}
