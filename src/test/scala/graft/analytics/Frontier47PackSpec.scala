package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Invariant checks for the round-7 third-session packs (Frontier47–51
  * + the new streaming/sqlfd entries). The oracle hash-match is the
  * correctness gate; these pin the MATHEMATICAL properties a silent
  * formula transcription error could break while still hash-matching a
  * matching mistake in the SQL twin.
  */
class Frontier47PackSpec extends AnyFunSuite {
  lazy val spark = graft.etl.TestSessions.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  test("a65: runs bounded by sign counts, expected runs positive") {
    val r = run("a65_runs_test").head
    val (np, nm, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(np > 0 && nm > 0)
    assert(runs >= 1 && runs <= np + nm)
    assert(r.getDouble(3) > 1.0) // E[R] = 2n+n-/(n) + 1 > 1
  }

  test("a66: Durbin-Watson statistic lies in [0, 4]") {
    val r = run("a66_durbin_watson").head
    val dw = r.getDouble(3)
    assert(dw >= 0.0 && dw <= 4.0)
    assert(math.abs(r.getDouble(4) - (1.0 - dw / 2.0)) < 1e-5)
  }

  test("a67: Grubbs statistics are positive and bounded by (n-1)/sqrt(n)") {
    val r = run("a67_grubbs_test").head
    val n = r.getLong(0).toDouble
    val bound = (n - 1) / math.sqrt(n)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= bound)
    assert(r.getDouble(4) > 0 && r.getDouble(4) <= bound)
  }

  test("ml_mutual_info: non-negative, and nation (refinement) >= region") {
    val rows = run("ml_mutual_info")
    val mi = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(mi.values.forall(_ >= -1e-5)) // round-6 noise floor
    // region is a deterministic function of nation -> data-processing
    // inequality: I(seg; nation) >= I(seg; region)
    assert(mi("nation") >= mi("region") - 1e-5)
  }

  test("w44: every lag's Pearson r in [-1,1]; lag 0 uses all months") {
    val rows = run("w44_cross_correlation")
    assert(rows.length == 5)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val n0 = rows.find(_.getInt(0) == 0).get.getLong(1)
    assert(rows.forall(_.getLong(1) <= n0))
  }

  test("x20: EMD normalized into [0,1]; group sizes sum to corpus") {
    val rows = run("x20_t_closeness")
    assert(rows.forall { r =>
      val e = r.getDouble(3); e >= 0.0 && e <= 1.0
    })
    val total = rows.map(_.getLong(2)).sum
    val nCust = graft.Tables.load(spark, sf, "customer").count()
    assert(total == nCust)
  }

  test("x21: a nation with exactly one primary-suppressed cell gets " +
    "exactly one complementary suppression") {
    val rows = run("x21_cell_suppression")
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val nPrimary = cells.count(_.getInt(3) == 1)
      val nComp = cells.count(_.getInt(3) == 2)
      if (nPrimary == 1) assert(nComp == 1)
      else assert(nComp == 0)
      // published values only for unsuppressed cells
      cells.foreach { c =>
        if (c.getInt(3) == 0) assert(!c.isNullAt(4))
        else assert(c.isNullAt(4))
      }
    }
  }

  test("g_component_stats: densities in (0,1]; nodes cover the graph") {
    val rows = run("g_component_stats")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, e, d) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n >= 2 && e >= 1)
      assert(d > 0.0 && d <= 1.0 + 1e-9)
      assert(e <= n * (n - 1) / 2) // undirected simple graph bound
    }
  }

  test("u5_pivot: pivoted counts rebuild per-nation customer totals") {
    val rows = run("u5_pivot")
    assert(rows.length == 25)
    val pivotTotal = rows.map { r =>
      (1 to 9 by 2).map(r.getLong).sum // n_* columns at odd indices
    }.sum
    val nCust = graft.Tables.load(spark, sf, "customer").count()
    assert(pivotTotal == nCust)
  }

  test("kappas: Cohen and Fleiss both land in [-1, 1] with consistent cells") {
    val c = run("eval_cohens_kappa").head
    assert(c.getLong(1) + c.getLong(2) + c.getLong(3) + c.getLong(4)
      == c.getLong(0))
    assert(math.abs(c.getDouble(7)) <= 1.0)
    val f = run("eval_fleiss_kappa").head
    assert(f.getLong(1) + f.getLong(2) + f.getLong(3) + f.getLong(4)
      == f.getLong(0))
    assert(math.abs(f.getDouble(7)) <= 1.0)
  }

  test("a68: band cells partition the joined fact table") {
    val r = run("a68_cochran_armitage").head
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(0))
    assert(r.getLong(5) + r.getLong(6) + r.getLong(7) == r.getLong(1))
  }

  test("a69: Ljung-Box Q is non-negative") {
    val r = run("a69_ljung_box").head
    assert(r.getDouble(1) >= 0.0)
  }

  test("w45: emits months 13..n with finite state, and the seasonal " +
    "component stays mean-bounded") {
    val rows = run("w45_holt_winters")
    assert(rows.length == 80 - 12)
    rows.foreach { r =>
      (1 to 5).foreach(i => assert(!r.isNullAt(i)))
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
  }

  test("mm_channel_histogram: per-image bin counts rebuild the exact " +
    "decoded pixel count") {
    val hist = run("mm_channel_histogram")
    val byImage = hist.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).sum }
    val feats = graft.textops.Multimodal.extractImageFeatures(
      graft.textops.Multimodal.imageMediaTable(
        graft.Tables.load(spark, sf, "documents"), "doc_id"))
      .select("media_id", "n_pixels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byImage.size == feats.size)
    byImage.foreach { case (id, n) => assert(n == feats(id)) }
  }

  test("p_mixture_temperature: allocations sum EXACTLY to the budget") {
    val rows = run("p_mixture_temperature")
    assert(rows.map(_.getLong(4)).sum == 10000L)
    // temperature < 1 flattens: max share of allocs < max share of docs
    val nTot = rows.map(_.getLong(1)).sum.toDouble
    val maxDocShare = rows.map(_.getLong(1)).max / nTot
    val maxAllocShare = rows.map(_.getLong(4)).max / 10000.0
    assert(maxAllocShare < maxDocShare)
  }

  test("i28: the six residue classes compact to their expected net ops") {
    val rows = run("i28_cdc_net_changes")
    val byMod = rows.groupBy(_.getLong(0) % 6)
    assert(!byMod.contains(1L)) // I…D cancels entirely
    assert(byMod(0L).forall(_.getString(2) == "I")) // I,U,U → I
    assert(byMod(2L).forall(_.getString(2) == "U"))
    assert(byMod(3L).forall(_.getString(2) == "D"))
    assert(byMod(4L).forall(_.getString(2) == "U")) // D…I → update
    assert(byMod(5L).forall(_.getString(2) == "I"))
    rows.foreach { r =>
      if (r.getString(2) == "D") assert(r.isNullAt(3))
      else assert(!r.isNullAt(3))
    }
  }

  test("ann_ivf_pq: 10 results, ADC ascending, and a subset of the " +
    "probed-cell corpus scored identically to ann_pq_topk's codes") {
    val rows = run("ann_ivf_pq_topk")
    assert(rows.length == 10)
    val adcs = rows.map(_.getDouble(5))
    assert(adcs.sameElements(adcs.sorted))
    rows.foreach(r => (1 to 4).foreach { i =>
      val c = r.getInt(i); assert(c >= 0 && c < 8)
    })
  }

  test("a70: level-2 splits land strictly inside their level-1 sides") {
    val rows = run("a70_binary_segmentation")
    val t1 = rows.find(_.getInt(0) == 1).get.getLong(3)
    rows.filter(_.getInt(0) == 2).foreach { r =>
      if (r.getString(1) == "left") assert(r.getLong(3) < t1)
      else assert(r.getLong(3) > t1)
      assert(r.getDouble(4) >= 0.0) // SS gain is non-negative
    }
  }

  test("ml_forecast_eval: the seasonal-naive arm has zero skill by " +
    "definition; both arms score the same months") {
    val rows = run("ml_forecast_eval")
    val naive = rows.find(_.getString(0) == "seasonal_naive").get
    assert(naive.getDouble(5) == 0.0)
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    rows.foreach(r => assert(r.getDouble(2) >= 0 && r.getDouble(3) >= 0))
  }

  test("ev_shapley_attribution: channel shares sum to 1") {
    val rows = run("ev_shapley_attribution")
    assert(rows.length == 3)
    val tot = rows.map(_.getDouble(2)).sum
    assert(math.abs(tot - 1.0) < 1e-4)
  }

  test("st_tws_timers: every fired timer reports the user's full " +
    "event count, 29 days after their first event") {
    val fired = run("st_tws_timers")
    val truth = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.expr("ts div 1000000")).as("f"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(fired.nonEmpty)
    fired.foreach { r =>
      val (n, f) = truth(r.getLong(0))
      assert(r.getLong(2) == n)
      assert(r.getLong(1) == f + 29L * 86400000L)
    }
  }

  test("a71: Mann-Kendall S is bounded by the pair count and Var(S) " +
    "is positive") {
    val r = run("a71_mann_kendall").head
    val n = r.getLong(0)
    assert(math.abs(r.getLong(1)) <= n * (n - 1) / 2)
    assert(r.getDouble(3) > 0.0)
  }

  test("a72: one Hurst estimate shared across the three block sizes, " +
    "and R/S grows with block size") {
    val rows = run("a72_hurst_rs")
    assert(rows.length == 3)
    assert(rows.map(_.getDouble(3)).distinct.length == 1)
    val bySz = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(bySz(0) < bySz(1) && bySz(1) < bySz(2))
    val h = rows.head.getDouble(3)
    assert(h > 0.0 && h < 1.5 && !h.isNaN)
  }

  test("q48: gross retention never exceeds net, and never exceeds 1") {
    val rows = run("q48_net_revenue_retention")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nrr, grr) = (r.getDouble(4), r.getDouble(5))
      assert(grr <= nrr + 1e-9) // capping can only lower the ratio
      assert(grr <= 1.0 + 1e-9) // Σmin(next, base) ≤ Σbase
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("x22: every row round-trips through AES, ciphertext padded to " +
    "16-byte blocks") {
    val rows = run("x22_column_encryption")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1)) // n_roundtrip_ok == n_names
      assert(r.getLong(3) % 16 == 0)
      assert(r.getLong(3) > r.getLong(4)) // ciphertext strictly larger
    }
  }

  test("ml_conformal_interval: the conformal guarantee holds on the " +
    "calibration half (coverage >= 90%)") {
    val r = run("ml_conformal_interval").head
    assert(r.getDouble(3) >= 0.9)
    assert(r.getDouble(1) > 0.0)
  }

  test("w47: quantiles are monotone in tau and calibration coverage " +
    "increases with tau") {
    val rows = run("w47_pinball_eval").sortBy(_.getDouble(0))
    assert(rows.length == 3)
    val qs = rows.map(_.getDouble(2))
    assert(qs(0) <= qs(1) && qs(1) <= qs(2))
    val cov = rows.map(_.getDouble(4))
    assert(cov(0) <= cov(1) && cov(1) <= cov(2))
    assert(rows.forall(_.getDouble(3) >= 0.0)) // pinball loss >= 0
  }

  test("st_chained_agg: each hourly rollup aggregates 1..4 quarters " +
    "covering its event count") {
    val rows = run("st_chained_agg")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, q) = (r.getLong(2), r.getLong(3))
      assert(q >= 1 && q <= 4)
      assert(n >= q) // each contributing quarter holds >= 1 event
    }
  }
}
