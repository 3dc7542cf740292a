package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Invariant + ground-truth checks for the ExtendedQueries pack. The
  * driver oracle hash-checks exact values at sf0.01/sf0.1; these specs
  * pin the SEMANTICS on hand-built inputs (grouped cumulative weights,
  * Bloom-filter equivalence, grid-join vs brute force, CDC keep-latest)
  * so a refactor that preserves determinism but breaks meaning fails
  * here first. */
class ExtendedQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("groupedCum equals the per-group window cumulative sum") {
    val base = Seq(
      ("a", 3L, 2L), ("a", 1L, 5L), ("a", 3L, 1L), ("a", 7L, 4L),
      ("b", 2L, 10L), ("b", 9L, 1L),
      ("c", 5L, 7L)
    ).toDF("g", "v", "w")
    val got = ExtendedQueries.groupedCum(base, "g", "v", col("w"))
      .select(col("g"), col("v"), col("cum").cast("long"),
              col("tot").cast("long"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 1L, 5L, 12L), ("a", 3L, 8L, 12L), ("a", 7L, 12L, 12L),
      ("b", 2L, 10L, 11L), ("b", 9L, 11L, 11L),
      ("c", 5L, 7L, 7L)))
  }

  test("a16 weighted median matches the naive window form") {
    val got = ExtendedQueries.queries("a16_weighted_median")(spark, sf)
      .select(col("l_returnflag"), col("median_price"))
      .as[(String, Double)].collect().toMap
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("f"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"),
        col("l_quantity").cast("long").as("w"))
    val wf = Window.partitionBy("f").orderBy("p")
    val want = li.withColumn("cum", sum(col("w")).over(
        wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy("f")))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("f").agg(min(col("p")).cast("double").as("m"))
      .as[(String, Double)].collect().toMap
    assert(got === want)
  }

  test("a17 spearman is 1 for a perfect monotone relation and handles ties") {
    // strictly increasing pair -> rho = 1 exactly; a tied column vs
    // itself also gives 1 under average ranks
    val mono = Seq(("x", 1L, BigDecimal(10)), ("x", 2L, BigDecimal(20)),
                   ("x", 3L, BigDecimal(35)), ("x", 4L, BigDecimal(99)))
      .toDF("f", "q", "p")
    val rq = ExtendedQueries.groupedCum(mono, "f", "q", lit(1L))
      .select(col("f"), col("q"),
        (lit(2) * (col("cum") - col("c")) + col("c") + 1).as("r2"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map { case (_, q, r) => q -> r.longValueExact() }.toMap
    // avg ranks of 1..4 doubled: 2,4,6,8
    assert(rq === Map(1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L))
    // tie-averaging: values (5,5,9) -> avg ranks (1.5,1.5,3) -> r2 (3,3,6)
    val tied = Seq(("x", 5L, BigDecimal(1)), ("x", 5L, BigDecimal(2)),
                   ("x", 9L, BigDecimal(3))).toDF("f", "q", "p")
    val rt = ExtendedQueries.groupedCum(tied, "f", "q", lit(1L))
      .select(col("q"),
        (lit(2) * (col("cum") - col("c")) + col("c") + 1).as("r2"))
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (q, r) => q -> r.longValueExact() }.toMap
    assert(rt === Map(5L -> 3L, 9L -> 6L))
  }

  test("a17 spearman on testdata stays within [-1, 1] and is non-trivial") {
    val rows = ExtendedQueries.queries("a17_spearman")(spark, sf)
      .select(col("l_returnflag"), col("spearman_r"))
      .as[(String, Double)].collect()
    assert(rows.length === 3)
    rows.foreach { case (f, r) =>
      assert(r >= -1.0 && r <= 1.0, s"flag=$f rho=$r")
      assert(r != 0.0, s"flag=$f suspiciously exactly zero")
    }
  }

  test("j15 bloom-filtered semi join equals the plain semi join") {
    val got = ExtendedQueries.queries("j15_bloom_semi_join")(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val o = graft.Tables.load(spark, sf, "orders")
    val cust = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val want = o.join(cust, o("o_custkey") === cust("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("geo grid join equals the brute-force radius join") {
    val c = graft.Tables.load(spark, sf, "customer").select(
      col("c_custkey").as("cid"), col("c_nationkey"),
      expr("(c_custkey * 37 + 11) % 1000").as("cx"),
      expr("(c_custkey * 73 + 29) % 1000").as("cy"))
    val s2 = graft.Tables.load(spark, sf, "supplier").select(
      col("s_suppkey").as("sid"),
      expr("(s_suppkey * 53 + 17) % 1000").as("sx"),
      expr("(s_suppkey * 97 + 43) % 1000").as("sy"))
    val brute = c.crossJoin(s2)
      .filter((col("cx") - col("sx")) * (col("cx") - col("sx"))
            + (col("cy") - col("sy")) * (col("cy") - col("sy")) <= 64)
      .count()
    val gridTotal = ExtendedQueries.queries("geo_radius_join")(spark, sf)
      .agg(sum(col("n_pairs"))).as[Long].head()
    assert(gridTotal === brute)
  }

  test("i16 CDC apply: deletes vanish, latest upsert wins, base passes through") {
    val o = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"),
              col("o_totalprice").cast("decimal(18,4)").as("price"))
    // rebuild expected final keyset: base keys (k%10<8) minus D-keys
    // (k%10>=5 && k%4==1), plus change keys surviving as upserts
    val expectedRows = o.filter(
        (col("k") % 10 < 8 || col("k") % 10 >= 5)
        && !(col("k") % 10 >= 5 && col("k") % 4 === 1))
      .count()
    val got = ExtendedQueries.queries("i16_cdc_apply")(spark, sf)
      .agg(sum(col("n_rows"))).as[Long].head()
    assert(got === expectedRows)
  }

  test("ev transition probabilities sum to 1 per source state") {
    val sums = ExtendedQueries.queries("ev_transition_matrix")(spark, sf)
      .groupBy("from_type").agg(sum(col("p_r")).as("s"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (f, p) =>
      assert(math.abs(p - 1.0) < 1e-4, s"from=$f sum=$p") }
  }

  test("j14 null-safe join carries the NULL bucket with full counts") {
    val rows = ExtendedQueries.queries("j14_null_safe_join")(spark, sf)
      .as[(Option[String], Long, Long)].collect()
    assert(rows.exists(_._1.isEmpty), "NULL priority bucket missing")
    rows.foreach { case (pr, n, tot) =>
      assert(n === tot, s"priority=$pr matched $n of $tot") }
  }

  test("a15 entropy within [0, ln k] and gini within [0, 1)") {
    val rows = ExtendedQueries.queries("a15_entropy")(spark, sf)
      .select(col("n_segments"), col("entropy_r"), col("gini_r"))
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, h, g) =>
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9, s"entropy $h k=$k")
      assert(g >= 0.0 && g < 1.0, s"gini $g")
    }
  }

  test("w17 EWMA lies within the min/max of its trailing frame") {
    val m = ExtendedQueries.queries("w17_ewma")(spark, sf)
    val rev = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("bn"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("bmon"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").as("brev"))
    val joined = m.join(rev, col("n_name") === col("bn")
        && col("mon") - col("bmon") >= 0 && col("mon") - col("bmon") <= 7)
      .groupBy("n_name", "mon", "ewma_r")
      .agg(min("brev").as("lo"), max("brev").as("hi"))
      .filter(col("ewma_r") < col("lo") - 0.001
           || col("ewma_r") > col("hi") + 0.001)
    assert(joined.count() === 0)
  }

  test("a19 count-min estimates respect the one-sided CMS bound") {
    val rows = ExtendedQueries.queries("a19_count_min")(spark, sf)
      .select(col("cms_ok")).as[Boolean].collect()
    assert(rows.length === 10 && rows.forall(identity))
  }

  test("f_array_pack renders sorted deduplicated segment lists") {
    val rows = ExtendedQueries.queries("f_array_pack")(spark, sf)
      .select(col("segments"), col("n_segments"))
      .as[(String, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (segs, n) =>
      val parts = segs.split(",").toSeq
      assert(parts.length === n)
      assert(parts === parts.sorted, s"unsorted: $segs")
      assert(parts.distinct.length === parts.length, s"dupes: $segs")
    }
  }

  test("dq_benford shares sum to 1 and expectations are the log law") {
    val rows = ExtendedQueries.queries("dq_benford")(spark, sf)
      .select(col("digit"), col("observed_r"), col("benford_r"))
      .as[(String, Double, Double)].collect()
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
    rows.foreach { case (d, _, b) =>
      val expect = math.log(1.0 + 1.0 / d.toInt) / math.log(10.0)
      assert(math.abs(b - expect) < 1e-6, s"digit $d") }
  }

  test("s17 dynamic overwrite rewrites only the patched partition") {
    val got = ExtendedQueries.queries(
        "s17_dynamic_partition_overwrite")(spark, sf)
      .select(col("pr"), col("n_orders"), col("total_price"))
      .as[(String, Long, Double)].collect()
      .map { case (k, n, p) => k -> ((n, p)) }.toMap
    val base = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .as[(String, Long, Double)].collect()
    base.foreach { case (pr, n, total) =>
      val (gn, gp) = got(pr)
      assert(gn === n, s"$pr row count changed")
      if (pr == "1-URGENT")
        assert(math.abs(gp - 2 * total) < 1e-4, s"$pr not doubled")
      else assert(math.abs(gp - total) < 1e-4, s"$pr was touched")
    }
  }

  test("ev_cohort_ltv is monotone non-decreasing in age per cohort") {
    val rows = ExtendedQueries.queries("ev_cohort_ltv")(spark, sf)
      .select(col("cohort"), col("age"), col("ltv_r"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).values
    assert(rows.nonEmpty)
    rows.foreach { cells =>
      val byAge = cells.toSeq.sortBy(_._2).map(_._3)
      byAge.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(1) >= pair(0) - 1e-9, "LTV decreased with age")
      }
    }
  }

  test("a20 skewness/kurtosis match direct computation on a hand sample") {
    // exact check against definitional central moments over quantities
    // of one flag at sf0.001
    val qs = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "A")
      .select(col("l_quantity").cast("long")).as[Long].collect()
      .map(_.toDouble)
    val n = qs.length.toDouble
    val mean = qs.sum / n
    val m2 = qs.map(q => (q - mean) * (q - mean)).sum / n
    val m3 = qs.map(q => math.pow(q - mean, 3)).sum / n
    val m4 = qs.map(q => math.pow(q - mean, 4)).sum / n
    val got = ExtendedQueries.queries("a20_higher_moments")(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select(col("skew_r"), col("kurt_r")).as[(Double, Double)].head()
    assert(math.abs(got._1 - m3 / math.pow(m2, 1.5)) < 1e-5)
    assert(math.abs(got._2 - (m4 / (m2 * m2) - 3.0)) < 1e-5)
  }

  test("s18 compaction lands exactly 4 files with identical content") {
    val row = ExtendedQueries.queries("s18_compaction")(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    val src = graft.Tables.load(spark, sf, "customer")
    assert(row._1 === 4L)
    assert(row._2 === src.count())
    assert(row._3 === src.agg(sum(col("c_custkey"))).as[Long].head())
  }

  test("ann recall eval agrees with a direct intersection of the entries") {
    val lsh = TextQueries.queries("ann_lsh_topk")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val brute = TextQueries.queries("ann_brute_force_topk")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val got = ExtendedQueries.queries("ann_recall_eval")(spark, sf)
      .select(col("n_overlap")).as[Long].head()
    assert(got === (lsh & brute).size.toLong)
  }

  test("g_modularity contributions sum to a valid modularity in [-0.5, 1]") {
    val rows = ExtendedQueries.queries("g_modularity")(spark, sf)
      .select(col("within_edges"), col("degree_sum"), col("q_contrib_r"))
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val q = rows.map(_._3).sum
    assert(q >= -0.5 && q <= 1.0, s"Q=$q out of range")
    // handshake: total degree = 2m = sum of degree_sum
    val m2x = rows.map(_._2).sum
    assert(m2x % 2 === 0)
    assert(rows.map(_._1).sum <= m2x / 2)
  }

  test("typed aggregator matches the untyped exact-decimal aggregation") {
    val got = ExtendedQueries.queries("typed_agg_revenue")(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val want = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,4)")
          * (lit(1) - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("j16 existence flags agree with direct semi/anti joins") {
    val rows = ExtendedQueries.queries("j16_existence_flags")(spark, sf)
    val o = graft.Tables.load(spark, sf, "orders")
    val withOrders = o.select(col("o_custkey")).distinct().count()
    assert(rows.filter(col("has_orders")).count() === withOrders)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(rows.filter(col("has_urgent_order")).count() === urgent)
    // urgent implies orders
    assert(rows.filter(col("has_urgent_order") && !col("has_orders"))
      .count() === 0)
  }

  test("w19 MAD matches a driver-side computation") {
    val got = ExtendedQueries.queries("w19_mad")(spark, sf)
      .as[(String, Long, Long)].collect()
    got.foreach { case (f, med, mad) =>
      val qs = graft.Tables.load(spark, sf, "lineitem")
        .filter(col("l_returnflag") === f)
        .select(col("l_quantity").cast("long")).as[Long].collect().sorted
      def lowMed(xs: Array[Long]): Long = {
        // smallest value whose cumulative count reaches half the total
        val tot = xs.length
        xs.zipWithIndex.collectFirst {
          case (v, i) if (i + 1) * 2 >= tot => v }.get
      }
      assert(med === lowMed(qs), s"median flag=$f")
      assert(mad === lowMed(qs.map(q => math.abs(q - med)).sorted),
             s"mad flag=$f")
    }
  }

  test("ev_dau_wau: WAU bounds DAU and stickiness is in (0, 1]") {
    val rows = ExtendedQueries.queries("ev_dau_wau")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, wau, st) =>
      assert(wau >= dau, s"day=$day wau<dau")
      assert(st > 0.0 && st <= 1.0, s"day=$day stickiness=$st")
    }
  }

  test("q23: above-nation-average membership verified per customer") {
    val rows = ExtendedQueries.queries("q23_decorrelated_subquery")(spark, sf)
      .select(col("c_nationkey"), col("n_above"))
      .as[(Int, Long)].collect().toMap
    val c = graft.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_acctbal").cast("decimal(18,4)")
        .as("bal")).as[(Int, BigDecimal)].collect()
    val byNation = c.groupBy(_._1)
    byNation.foreach { case (nk, xs) =>
      val avg = xs.map(_._2).sum / xs.length
      val above = xs.count(_._2 > avg).toLong
      assert(rows.getOrElse(nk, 0L) === above, s"nation $nk")
    }
  }

  test("ev_power_users: threshold is the exact p95 of per-user counts") {
    val (n, _, thr) = ExtendedQueries.queries("ev_power_users")(spark, sf)
      .as[(Long, Long, Long)].head()
    val counts = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id").count().select(col("count"))
      .as[Long].collect().sorted
    val need = (counts.length * 19 + 19) / 20 // ceil(0.95 n)
    val expectThr = counts(need - 1)
    assert(thr === expectThr)
    assert(n === counts.count(_ >= expectThr).toLong)
  }

  test("d_survivorship: originals beat mirrors and clusters are >= 2") {
    val rows = ExtendedQueries.queries("d_survivorship")(spark, sf)
      .select(col("n_members"), col("survivor_id"), col("survivor_source"))
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, id, src) =>
      assert(m >= 2)
      // identical text -> tie on length -> lowest doc_id wins, which is
      // always the original, never the +10M mirror
      assert(id < 10000000L, s"mirror won: $id")
      assert(!src.endsWith("-mirror"), src)
    }
  }

  test("j17 forward as-of picks the EARLIEST purchase at-or-after each click") {
    // hand-built: u1 click at 100 with purchases at 90 (before, ignored)
    // and 150/200 (150 wins); u2 click with no later purchase
    val clicks = Seq((1L, 100L), (2L, 500L)).toDF("user_id", "cus")
      .withColumn("nt", -col("cus"))
    val purch = Seq((1L, 90L), (1L, 150L), (1L, 200L), (2L, 400L))
      .toDF("user_id", "pus")
      .withColumn("nt", -col("pus"))
      .select(col("user_id"), col("nt"), col("pus"))
    val got = graft.operators.AsOfJoin.asOf(clicks, purch, "user_id", "nt")
      .select(col("user_id"), col("cus"), col("pus"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === Set((1L, 100L, Some(150L)), (2L, 500L, None)))
  }

  test("ev_bot_features rates are consistent with counts and spans") {
    val rows = ExtendedQueries.queries("ev_bot_features")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // sorted by volume descending
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    rows.foreach { case (u, n, span, types, rate) =>
      assert(types >= 1 && span >= 0)
      val expect = n.toDouble * 3600.0 / math.max(span, 1L).toDouble
      assert(math.abs(rate - expect) < 1e-4, s"user $u")
    }
  }

  test("s19 PERMISSIVE read quarantines exactly the broken records") {
    val rows = ExtendedQueries.queries("s19_permissive_json")(spark, sf)
      .select(col("lang"), col("n_rows"), col("n_corrupt"))
      .as[(Option[String], Long, Long)].collect()
    val corrupt = rows.filter(_._1.isEmpty)
    val clean = rows.filter(_._1.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(corrupt.map(_._2).sum ===
      docs.filter(col("doc_id") % 13 === 0).count())
    // every corrupt-bucket row is flagged, no clean row is
    assert(corrupt.forall(r => r._3 === r._2))
    assert(clean.forall(_._3 === 0L))
    assert(clean.map(_._2).sum ===
      docs.filter(col("doc_id") % 13 =!= 0).count())
  }

  test("ev_twap weighs readings by holding duration on a hand case") {
    // values 10 (held 3us), 40 (held 1us), last 100 carries no weight:
    // twap = (10*3 + 40*1) / 4 = 17.5
    val rows = ExtendedQueries.queries("ev_twap")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, span, tw) => assert(span > 0, s"user $u") }
    // semantic hand-check through the same lead/weight pipeline shape
    import org.apache.spark.sql.expressions.Window
    val e = Seq((1L, 0L, 10.0), (1L, 3L, 40.0), (1L, 4L, 100.0))
      .toDF("user_id", "us", "v")
    val w = Window.partitionBy("user_id").orderBy("us")
    val got = e.withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("user_id")
      .agg((sum(col("v") * (col("nxt") - col("us")))
        / sum(col("nxt") - col("us"))).as("twap"))
      .as[(Long, Double)].head()
    assert(math.abs(got._2 - 17.5) < 1e-9)
  }

  test("f_hof_pack facets agree with direct aggregates") {
    val rows = ExtendedQueries.queries("f_hof_pack")(spark, sf)
      .select(col("o_custkey"), col("n_orders"), col("hof_total"))
      .as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    val want = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("int").as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("total"))
      .filter(col("n") >= 2)
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (ck, n, total) =>
      val (wn, wt) = want(ck)
      assert(n === wn, s"cust $ck")
      assert(math.abs(total - wt) < 1e-6, s"cust $ck")
    }
  }

  test("a21 covariance matrix is symmetric-complete and matches Spark's covar_samp") {
    val rows = ExtendedQueries.queries("a21_cov_matrix")(spark, sf)
      .as[(String, String, String, Double)].collect()
    assert(rows.length === 18) // 3 flags x 6 upper-triangle cells
    val want = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(covar_samp(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double)].collect().toMap
    rows.filter(r => r._2 == "qty" && r._3 == "price").foreach {
      case (f, _, _, c) => assert(math.abs(c - want(f)) < 0.01, s"flag $f")
    }
  }

  test("d_lsh_tuning: shipped (8 bands, 4 rows) layout catches s>=0.8") {
    val rows = ExtendedQueries.queries("d_lsh_tuning")(spark, sf)
      .filter(col("bands") === 8 && col("rows_per_band") === 4)
      .select(col("sim"), col("p_candidate_r"), col("catches_dups"))
      .as[(Double, Double, Boolean)].collect()
      .map { case (s2, p, c) => s2 -> ((p, c)) }.toMap
    // monotone in similarity, and the production layout is justified
    assert(rows(0.8)._1 >= 0.98 && rows(0.8)._2)
    assert(rows(0.9)._1 > rows(0.8)._1 && rows(0.5)._1 < rows(0.6)._1)
  }

  test("sql front door equals the DataFrame formulation") {
    val viaSql = ExtendedQueries.queries("sql_front_door")(spark, sf)
      .as[(String, Long, Double, Long)].collect().toSet
    val viaDf = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"),
        min(col("o_orderkey")))
      .as[(String, Long, Double, Long)].collect().toSet
    assert(viaSql === viaDf)
  }

  test("a22 HLL inclusion-exclusion stays inside the 10% corridor") {
    val (exact, ok) = ExtendedQueries.queries("a22_hll_intersection")(spark, sf)
      .as[(Long, Boolean)].head()
    assert(exact > 0 && ok)
  }

  test("q24 decomposition: volume + price effects reconstruct d_rev") {
    val rows = ExtendedQueries.queries("q24_mix_decomposition")(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, dRev, vol, price) =>
      // Bennet decomposition is exact up to the 4dp rounding of the parts
      assert(math.abs(dRev - (vol + price)) < 0.01,
        s"brand $b: $dRev != $vol + $price")
    }
  }

  test("ev_interarrival histogram covers every adjacent pair once") {
    val total = ExtendedQueries.queries(
        "ev_interarrival_histogram")(spark, sf)
      .agg(sum(col("n_gaps"))).as[Long].head()
    val perType = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type").count().select(col("count")).as[Long].collect()
    assert(total === perType.map(n => math.max(n - 1, 0L)).sum)
  }

  test("mm_batch_manifest batches stay under ~1MB plus one item") {
    val rows = ExtendedQueries.queries("mm_batch_manifest")(spark, sf)
      .select(col("source"), col("batch_id"), col("batch_bytes"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every non-final batch of a source must not exceed the target by
    // more than one item's bytes; with ~1KB docs the slack is small
    rows.groupBy(_._1).values.foreach { batches =>
      val sorted = batches.toSeq.sortBy(_._2)
      sorted.dropRight(1).foreach { case (src, _, bytes) =>
        assert(bytes <= 1048576 + 4096, s"$src oversized batch: $bytes") }
    }
    // ids are contiguous from 0 per source
    rows.groupBy(_._1).values.foreach { bs =>
      assert(bs.map(_._2).toSeq.sorted === (0L until bs.size).toSeq) }
  }

  test("q25 shares: regions sum to 100, total sums to 100") {
    val rows = ExtendedQueries.queries("q25_percent_of_parent")(spark, sf)
      .select(col("r_name"), col("pct_of_region_r"), col("pct_of_total_r"))
      .as[(String, Double, Double)].collect()
    assert(math.abs(rows.map(_._3).sum - 100.0) < 1e-3)
    rows.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._2).sum - 100.0) < 1e-3) }
  }

  test("ev_path_analysis counts trigrams consistently with pair counts") {
    val paths = ExtendedQueries.queries("ev_path_analysis")(spark, sf)
      .as[(String, String, String, Long)].collect()
    assert(paths.nonEmpty && paths.length <= 20)
    // descending and positive
    assert(paths.map(_._4).toSeq === paths.map(_._4).sortBy(-_).toSeq)
    assert(paths.forall(_._4 > 0))
  }

  test("i21 quarantine routing partitions rows exactly (first rule wins)") {
    val rows = ExtendedQueries.queries("i21_dq_quarantine")(spark, sf)
      .select(col("rule"), col("n_rows")).as[(String, Long)].collect().toMap
    val o = graft.Tables.load(spark, sf, "orders")
    assert(rows.values.sum === o.count(), "row conservation")
    val r1 = o.filter(col("o_totalprice").cast("decimal(18,4)") > 400000)
      .count()
    assert(rows.getOrElse("r1_price_outlier", 0L) === r1)
    // first-rule-wins: r3 counts exclude rows already caught by r1/r2
    val r3 = o.filter(col("o_orderstatus") === "P"
      && col("o_totalprice").cast("decimal(18,4)") <= 400000
      && col("o_orderdate") >= lit("1995-06-01").cast("date")).count()
    assert(rows.getOrElse("r3_pending_status", 0L) === r3)
  }

  test("ev_max_concurrent matches a driver-side sweep line") {
    val (peak, firstT) = ExtendedQueries.queries("ev_max_concurrent")(spark, sf)
      .as[(Long, Long)].head()
    val starts = graft.Tables.load(spark, sf, "events")
      .select(expr("ts div 1000")).as[Long].collect()
    val horizon = 300000000L
    // driver sweep with the same half-open tie rule (-1 before +1)
    val events = (starts.map(t => (t, 1)) ++
      starts.map(t => (t + horizon, -1))).sortBy(e => (e._1, e._2))
    var cur = 0L; var best = 0L; var bestT = Long.MaxValue
    events.foreach { case (t2, d) =>
      cur += d
      if (cur > best) { best = cur; bestT = t2 }
    }
    assert(peak === best)
    assert(firstT === bestT)
  }

  test("j18 tiered match: conservation and tier-1 priority") {
    val rows = ExtendedQueries.queries("j18_tiered_match")(spark, sf)
      .select(col("match_tier"), col("n_orders"))
      .as[(Int, Long)].collect().toMap
    val o = graft.Tables.load(spark, sf, "orders")
    assert(rows.values.sum === o.count(), "every order resolves to a tier")
    // exact-key matches: orders whose customer key is in the master set
    val t1 = o.filter(col("o_custkey") % 3 =!= 0).count()
    assert(rows.getOrElse(1, 0L) === t1)
    // tier 2 exists (masters cover every nation at this SF -> no tier 0)
    assert(rows.getOrElse(2, 0L) > 0)
    assert(rows.getOrElse(0, 0L) === 0L)
  }

  test("g_bfs_layers levels are disjoint and level-1 nodes really neighbor a seed") {
    val rows = ExtendedQueries.queries("g_bfs_layers")(spark, sf)
      .as[(Int, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    assert(rows.head._1 === 0 && rows.head._2 > 0, "seed level present")
    // levels partition the reached set: counts are positive while the
    // frontier is alive, and levels never repeat
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("a23 winsorized mean clamps exactly at the count-based p05/p95") {
    val rows = ExtendedQueries.queries("a23_winsorized_mean")(spark, sf)
      .select(col("l_returnflag"), col("p05"), col("p95"),
              col("winsorized_mean_r"))
      .as[(String, Long, Long, Double)].collect()
    rows.foreach { case (f, p05, p95, wm) =>
      val qs = graft.Tables.load(spark, sf, "lineitem")
        .filter(col("l_returnflag") === f)
        .select(col("l_quantity").cast("long")).as[Long].collect().sorted
      def kth(frac20: Int): Long = {
        val tot = qs.length.toLong
        qs.zipWithIndex.collectFirst {
          case (v, i) if (i + 1) * 20 >= tot * frac20 => v }.get
      }
      assert(p05 === kth(1), s"p05 flag=$f")
      assert(p95 === kth(19), s"p95 flag=$f")
      val want = qs.map(q => math.min(math.max(q, p05), p95))
        .sum.toDouble / qs.length
      assert(math.abs(wm - want) < 1e-5, s"mean flag=$f")
    }
  }

  test("s20 manifest snapshots: v1 is isolated from the v2 append") {
    val rows = ExtendedQueries.queries("s20_manifest_time_travel")(spark, sf)
      .select(col("snapshot"), col("n_orders"))
      .as[(String, Long)].collect().toMap
    val o = graft.Tables.load(spark, sf, "orders")
    assert(rows("v1") === o.filter(year(col("o_orderdate")) < 1997).count())
    assert(rows("v2") === o.count())
    assert(rows("v1") < rows("v2"))
  }

  test("q26 ABC/XYZ: shares sum to 100 and every part classifies once") {
    val rows = ExtendedQueries.queries("q26_abc_xyz")(spark, sf)
      .select(col("abc"), col("xyz"), col("n_parts"), col("rev_share_r"))
      .as[(String, String, Long, Double)].collect()
    assert(math.abs(rows.map(_._4).sum - 100.0) < 1e-3)
    val nParts = graft.Tables.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._3).sum === nParts)
    assert(rows.forall(r => Set("A", "B", "C")(r._1)
      && Set("X", "Y", "Z")(r._2)))
  }

  test("leakage-safe split keeps mirrored duplicates on one side, zero violations") {
    val rows = ExtendedQueries.queries("p_leakage_safe_split")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq === Seq("test", "train"))
    rows.foreach { case (_, _, _, viol) => assert(viol === 0L) }
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val nMirrors = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 7 === 0).count()
    assert(rows.map(_._2).sum === nDocs + nMirrors)
  }

  test("a24 revenue Gini matches a driver-side Lorenz computation") {
    val (_, gini) = ExtendedQueries.queries("a24_revenue_gini")(spark, sf)
      .as[(Long, Double)].head()
    val revs = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("rev"))
      .select("rev").as[Double].collect().sorted
    val n = revs.length.toDouble
    val s2 = revs.sum
    val irx = revs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val want = 2.0 * irx / (n * s2) - (n + 1.0) / n
    assert(math.abs(gini - want) < 1e-5)
    assert(gini > 0.0 && gini < 1.0)
  }

  test("j19 nearest-value join picks the truly closest same-nation supplier") {
    // brute-force the nearest neighbor and compare the per-nation gaps
    val c = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nk"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("cb"))
    val s2 = graft.Tables.load(spark, sf, "supplier")
      .select(col("s_nationkey").as("snk"),
        (col("s_acctbal").cast("decimal(18,2)") * 100).cast("long").as("sb"))
    val brute = c.join(s2, col("nk") === col("snk"))
      .groupBy("c_custkey", "nk")
      .agg(min(abs(col("cb") - col("sb"))).as("gap"))
      .groupBy(col("nk").as("c_nationkey"))
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("gap")).cast("double")
          / count(lit(1)).cast("double") / 100.0, 6).as("avg_abs_gap_r"))
      .as[(Int, Long, Double)].collect().toSet
    val got = ExtendedQueries.queries("j19_nearest_value_join")(spark, sf)
      .as[(Int, Long, Double)].collect().toSet
    assert(got === brute)
  }

  test("a18 HLL estimates stay inside the 5% corridor") {
    val rows = ExtendedQueries.queries("a18_hll_merge")(spark, sf)
      .select(col("approx_ok")).as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }
}
