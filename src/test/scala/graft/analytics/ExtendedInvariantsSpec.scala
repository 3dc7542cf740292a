package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSessions

/** Structural invariants of the round-5 curation/statistics entries —
  * properties the DuckDB hash-compare can't state (it proves equality,
  * not meaning). Run at sf0.001 for speed. */
class ExtendedInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = ExtendedQueries.queries(name)(spark, dir)

  test("sequence packing accounts for every token exactly once") {
    val r = q("p_sequence_packing").head()
    val nDocs = r.getAs[Long]("n_docs")
    val total = r.getAs[Long]("total_tokens")
    val nSeq = r.getAs[Long]("n_sequences")
    val lastFill = r.getAs[Long]("last_fill_tokens")
    assert(nSeq === (total - 1) / 512 + 1)
    assert((nSeq - 1) * 512 + lastFill === total)
    assert(lastFill >= 1 && lastFill <= 512)
    assert(r.getAs[Long]("n_split_docs") <= nDocs)
    assert(r.getAs[Long]("max_span") >= 1)
  }

  test("mixture sampling weights sum to ~1 and upsample the tail") {
    val rows = q("p_mixture_sampling").collect()
    val wSum = rows.map(_.getAs[Double]("w_sample")).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum to $wSum")
    // temperature < 1 flattens: smallest source must be upsampled,
    // largest downsampled
    val minSrc = rows.minBy(_.getAs[Long]("tokens"))
    val maxSrc = rows.maxBy(_.getAs[Long]("tokens"))
    assert(minSrc.getAs[Double]("epochs") >= 1.0)
    assert(maxSrc.getAs[Double]("epochs") <= 1.0)
  }

  test("KS statistic is a valid probability distance") {
    val r = q("dq_ks_test").head()
    val d = r.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Long]("d_num") <=
      r.getAs[Long]("n1") * r.getAs[Long]("n2"))
  }

  test("interval union never exceeds the sum of durations") {
    import org.apache.spark.sql.functions._
    val union = q("j22_interval_union")
      .agg(sum("union_us")).head().getLong(0)
    val rawSum = graft.Tables.load(spark, dir, "events")
      .select((col("value").cast("decimal(18,2)") * 1000000)
        .cast("long").as("dur"))
      .agg(sum("dur")).head().getLong(0)
    assert(union <= rawSum)
    assert(union > 0)
  }

  test("curriculum phases are token-balanced within one doc's tokens") {
    val rows = q("p_curriculum_ordering").collect()
    assert(rows.map(_.getAs[Long]("phase")).toSet === Set(0L, 1L, 2L))
    val toks = rows.sortBy(_.getAs[Long]("phase")).map(_.getAs[Long]("n_tokens"))
    val total = toks.sum
    // each phase within a third ± the largest single document
    val maxDoc = graft.Tables.load(spark, dir, "documents")
      .select(graft.textops.TextFunctions.bpeTokenEstimate(
        org.apache.spark.sql.functions.col("text")).as("tk"))
      .agg(org.apache.spark.sql.functions.max("tk")).head().getLong(0)
    toks.foreach(t => assert(math.abs(t - total / 3.0) <= maxDoc + 512,
      s"unbalanced phase: $t of $total (maxDoc $maxDoc)"))
    // scores descend across phases (easiest first)
    val s = rows.sortBy(_.getAs[Long]("phase"))
    assert(s(0).getAs[Double]("min_score") >= s(1).getAs[Double]("max_score")
      - 1e-9)
    assert(s(1).getAs[Double]("min_score") >= s(2).getAs[Double]("max_score")
      - 1e-9)
  }

  test("k-anonymity publishes no identifiable cell under k") {
    val rows = q("x6_k_anonymity").collect()
    rows.filter(_.getAs[String]("nation_d") != "*").foreach { r =>
      assert(r.getAs[Long]("n_customers") >= 5,
        s"cell ${r.mkString(",")} discloses < 5 members")
    }
  }

  test("frequency capping conserves events and caps at 5 per user-day") {
    import org.apache.spark.sql.functions._
    val rows = q("ev_frequency_capping")
    val total = rows.agg(sum(col("n_delivered") + col("n_suppressed")))
      .head().getLong(0)
    val nEvents = graft.Tables.load(spark, dir, "events").count()
    assert(total === nEvents)
  }
}
