package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier2Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier2QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("a29_mann_whitney matches a brute-force rank computation") {
    val row = Frontier2Queries.queries("a29_mann_whitney")(spark, sf)
      .select(col("n1"), col("n2"), col("u1"), col("z_r"), col("rbc_r"))
      .as[(Long, Long, Double, Double, Double)].head()
    val (n1, n2, u1, z, rbc) = row
    // brute force on the collected sample: average ranks over the
    // combined sorted values, U1 = R1 - n1(n1+1)/2
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang").isin("en", "es"))
      .select(col("lang"), col("n_chars")).as[(String, Long)].collect()
    val sorted = docs.map(_._2).sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val r1 = docs.filter(_._1 == "en").map(d => avgRank(d._2)).sum
    val bn1 = docs.count(_._1 == "en").toLong
    val bn2 = docs.count(_._1 == "es").toLong
    assert(n1 === bn1 && n2 === bn2)
    assert(math.abs(u1 - (r1 - bn1 * (bn1 + 1) / 2.0)) < 1e-6)
    // U within its range; rank-biserial consistent with U
    assert(u1 >= 0.0 && u1 <= (n1 * n2).toDouble)
    assert(math.abs(rbc - (1.0 - 2.0 * u1 / (n1 * n2))) < 2e-6)
    // z sign agrees with which group has the larger rank sum
    val meanU = n1 * n2 / 2.0
    assert((u1 > meanU && z > 0) || (u1 < meanU && z < 0) ||
      (u1 == meanU && z == 0.0))
  }

  test("a30_poisson_bootstrap CI brackets the point estimate, deterministically") {
    val q = Frontier2Queries.queries("a30_poisson_bootstrap")(_, _)
    val r = q(spark, sf)
      .select(col("n_reps"), col("est_mean_r"), col("ci_lo_r"), col("ci_hi_r"))
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 === 64L)
    assert(r._3 <= r._2 && r._2 <= r._4, s"CI [${r._3}, ${r._4}] vs ${r._2}")
    // the interval is a real interval, not a point
    assert(r._4 > r._3)
    val again = q(spark, sf)
      .select(col("n_reps"), col("est_mean_r"), col("ci_lo_r"), col("ci_hi_r"))
      .as[(Long, Double, Double, Double)].head()
    assert(r === again)
  }

  test("q28_seasonal_backtest covers complete years with nonneg MAPE") {
    val rows = Frontier2Queries.queries("q28_seasonal_backtest")(spark, sf)
      .select(col("yr"), col("n_months"), col("mape_r"))
      .as[(Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0.0))
    // all years but the (possibly partial) last have 12 backtest months
    val complete = rows.dropRight(1)
    assert(complete.forall(_._2 === 12L), complete.mkString(","))
    // years are consecutive: backtesting starts one year after data starts
    assert(rows.map(_._1).toSeq === (rows.head._1 to rows.last._1))
  }

  test("g_clustering_coeff is in [0,1] and exact on a brute-force check") {
    val got = Frontier2Queries.queries("g_clustering_coeff")(spark, sf)
      .select(col("node"), col("deg"), col("tri_n"), col("cc_r"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, d, t, cc) =>
      cc >= 0.0 && cc <= 1.0 + 1e-9 && d >= 2 &&
        math.abs(cc - 2.0 * t / (d.toDouble * (d - 1))) < 1e-6
    })
    // brute force: rebuild the co-purchase edges and count each node's
    // closed neighbor pairs directly
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().groupBy(_._1).map(_._2.map(_._2).toSet)
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    op.foreach { parts =>
      val ps = parts.toSeq.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        pairCount((ps(i), ps(j))) = pairCount.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCount.filter(_._2 >= 2).keySet
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (a, b) => nbrs(a) += b; nbrs(b) += a }
    got.foreach { case (node, d, t, _) =>
      val nb = nbrs(node).toSeq.sorted
      assert(d === nb.size.toLong, s"deg mismatch at $node")
      val closed = (for (i <- nb.indices; j <- (i + 1) until nb.size
        if edges.contains((nb(i) min nb(j), nb(i) max nb(j)))) yield 1).size
      assert(t === closed.toLong, s"tri mismatch at $node")
    }
  }

  test("x8_dp_noisy_count releases one perturbed value per nation") {
    val got = Frontier2Queries.queries("x8_dp_noisy_count")(spark, sf)
      .select(col("n_name"), col("noisy_count_r"))
      .as[(String, Double)].collect()
    val nNations = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(got.length === nNations)
    val truth = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy(col("c_nationkey")).count()
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("count")).as[(String, Long)].collect().toMap
    // every released value is truly perturbed (Laplace noise is never
    // exactly 0 for an md5-derived uniform) yet within the deterministic
    // tail bound |noise| <= 52*ln(2) ~ 36
    got.foreach { case (name, noisy) =>
      val c = truth.getOrElse(name, 0L).toDouble
      assert(noisy !== c)
      assert(math.abs(noisy - c) < 37.0, s"$name: $noisy vs $c")
    }
  }

  test("pipe_dataset_card shares sum to 1 and stats are internally consistent") {
    val rows = Frontier2Queries.queries("pipe_dataset_card")(spark, sf)
      .select(col("lang"), col("n_docs"), col("n_sources"), col("tokens_total"),
        col("dup_docs"), col("p50_chars"), col("avg_chars_r"),
        col("token_share_r"))
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum === total)
    assert(math.abs(rows.map(_._8).sum - 1.0) < 1e-4)
    rows.foreach { case (lang, n, ns, toks, dups, p50, avg, share) =>
      assert(n > 0 && ns >= 1 && toks > 0 && share > 0.0)
      assert(dups >= 0 && dups <= n)
      // median and mean both live inside the observed length range
      assert(p50 > 0 && avg > 0)
    }
  }
}
