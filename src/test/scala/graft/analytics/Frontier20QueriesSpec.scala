package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier20Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier20QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ev_next_event_eval scores odd users with an even-user model") {
    val got = Frontier20Queries.queries("ev_next_event_eval")(spark, sf)
      .select(col("context"), col("n_eval"), col("n_correct"),
        col("acc_r"), col("n_majority"), col("baseline_r"))
      .as[(String, Long, Long, Double, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (ctx, n, nc, acc, nm, base) =>
      assert(n > 0, ctx)
      assert(nc <= n && nm <= n)
      assert(math.abs(acc - nc.toDouble / n) < 1e-6)
      assert(math.abs(base - nm.toDouble / n) < 1e-6)
    }
    // rebuild: the model must be the train-side argmax per context
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1)
    val trans = ev.toSeq.flatMap { case (uid, rows) =>
      val seq = rows.sortBy(r => (r._4, r._2)).map(_._3)
      seq.zip(seq.tail).map { case (a, b) => (uid, a, b) }
    }
    val train = trans.filter(_._1 % 2 == 0)
    val evalT = trans.filter(_._1 % 2 == 1)
    val model = train.groupBy(_._2).map { case (a, xs) =>
      a -> xs.groupBy(_._3).toSeq
        .sortBy { case (b, ys) => (-ys.size, b) }.head._1
    }
    val expAcc = evalT.groupBy(_._2).map { case (a, xs) =>
      a -> xs.count(x => model.get(a).contains(x._3))
    }
    got.foreach { case (ctx, n, nc, _, _, _) =>
      assert(n === evalT.count(_._2 == ctx).toLong, s"$ctx eval size")
      assert(nc === expAcc.getOrElse(ctx, 0).toLong, s"$ctx correct")
    }
  }

  test("a44_gumbel_tail parameters match the block-maxima moments") {
    val got = Frontier20Queries.queries("a44_gumbel_tail")(spark, sf)
      .select(col("n_blocks"), col("block_mean_r"), col("beta_r"),
        col("mu_r"), col("return_level_12_r"), col("p_exceed_150pct_r"))
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    val blocks = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mon"))
      .agg(max(col("o_totalprice")).as("mx"))
      .select(col("mx")).as[Double].collect()
    assert(got._1 === blocks.length.toLong)
    val n = blocks.length
    val mean = blocks.sum / n
    val variance = blocks.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val beta = math.sqrt(variance * 6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    assert(math.abs(got._2 - mean) < 1e-2)
    assert(math.abs(got._3 - beta) < math.max(1e-2, beta * 1e-4))
    assert(math.abs(got._4 - mu) < math.max(1e-2, mu * 1e-4))
    // return level exceeds the location parameter (1/12 < 1-1/e)
    assert(got._5 > got._4)
    assert(got._6 >= 0.0 && got._6 <= 1.0)
    // the return level reproduces the quantile: F(rl) = 1 - 1/12
    val f = math.exp(-math.exp(-((got._5 - mu) / beta)))
    assert(math.abs(f - (1.0 - 1.0 / 12.0)) < 1e-3)
  }

  test("t_lexical_stats ratios match a driver-side vocabulary rebuild") {
    val got = Frontier20Queries.queries("t_lexical_stats")(spark, sf)
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("ttr_r"), col("hapax_share_r"),
        col("mean_word_len_r"))
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val all = docs.flatMap(d => toks(d._2))
    val hapax = all.groupBy(identity).collect {
      case (w, xs) if xs.length == 1 => w }.toSet
    val bySrc = docs.groupBy(_._1)
    got.foreach { case (src, nt, ntypes, nh, ttr, hs, mwl) =>
      val mine = bySrc(src).flatMap(d => toks(d._2))
      assert(nt === mine.length.toLong, s"$src tokens")
      val types = mine.distinct
      assert(ntypes === types.length.toLong, s"$src types")
      assert(nh === types.count(hapax), s"$src hapax")
      assert(math.abs(ttr - types.length.toDouble / mine.length) < 1e-6)
      assert(math.abs(hs - types.count(hapax).toDouble / types.length)
        < 1e-6)
      assert(math.abs(mwl - mine.map(_.length).sum.toDouble / mine.length)
        < 1e-6)
    }
  }
}
