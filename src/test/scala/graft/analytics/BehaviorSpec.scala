package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSessions

/** Ground-truth checks for the behavioral operators on hand-built
  * inputs: funnel ordering/window semantics, retention cohort cells,
  * basket affinity measures. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  test("funnel honors stage order and the per-stage window") {
    // u1 completes in order; u2 clicked BEFORE signup (doesn't count),
    // clicks again late (outside window); u3 never clicks; u4 completes
    // but purchase is outside the click window
    val horizon = 100L
    val e = Seq(
      (1L, "signup", 1000L), (1L, "click", 1050L), (1L, "purchase", 1080L),
      (2L, "click", 900L), (2L, "signup", 1000L), (2L, "click", 1200L),
      (3L, "signup", 1000L),
      (4L, "signup", 1000L), (4L, "click", 1010L), (4L, "purchase", 1150L)
    ).toDF("user_id", "event_type", "sec")
    val got = BehaviorQueries.funnelStages(
        e, Seq("signup", "click", "purchase"), horizon)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1, "signup", 4L, 0L),
      (2, "click", 2L, (1050L - 1000L) + (1010L - 1000L)),
      (3, "purchase", 1L, 1080L - 1050L)))
  }

  test("retention counts cohort users active at each day offset") {
    val e = Seq(
      (1L, "signup", 10L), (1L, "click", 10L), (1L, "view", 12L),
      (2L, "signup", 10L), (2L, "view", 11L),
      (3L, "signup", 11L), (3L, "view", 12L),
      // activity before the signup day never counts
      (3L, "click", 9L)
    ).toDF("user_id", "event_type", "day")
    val got = BehaviorQueries.retentionMatrix(e, "signup")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (10L, 0L, 2L), (10L, 1L, 1L), (10L, 2L, 1L),
      (11L, 0L, 1L), (11L, 1L, 1L)))
  }

  test("basket affinity computes exact support, confidence and lift") {
    // 4 baskets; items: A in 3, B in 2, {A,B} in 2, {A,C} in 1
    val rows = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "D"), (4L, "D") // duplicate line collapses
    ).toDF("basket", "item")
    val got = BehaviorQueries.basketAffinity(rows, "basket", "item", minBoth = 2L)
      .as[(String, String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 2L, 2.0 / 4.0, 2.0 / 3.0,
      (2.0 * 4.0) / (3.0 * 2.0))))
  }

  test("anomaly days flag only >=2-sigma days, with exact z-scores") {
    // u1: counts (1,1,1,1,1,7) over 6 days — day 15 is the spike (a
    // sample z-score is capped at (n-1)/sqrt(n), so 5 days can never
    // reach 2 sigma; 6 can, barely);
    // u2: constant counts (zero variance) — never flagged;
    // u3: one active day — excluded (needs >= 2 days)
    val e = ((10L to 14L).map(d => (1L, d)) ++ Seq.fill(7)((1L, 15L)) ++
        Seq.fill(2)((2L, 10L)) ++ Seq.fill(2)((2L, 11L)) ++
        Seq.fill(3)((3L, 10L)))
      .toDF("user_id", "day")
    val got = BehaviorQueries.anomalyDays(e, sigmas = 2.0)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // mean = 2, var = (54 - 144/6)/5 = 6, z = (7-2)/sqrt(6) ~ 2.0412
    val z = BigDecimal(5.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((1L, 15L, 7L, z)))
  }

  test("anomaly days on an empty input is empty") {
    val e = Seq.empty[(Long, Long)].toDF("user_id", "day")
    assert(BehaviorQueries.anomalyDays(e, 2.0).count() === 0)
  }

  test("funnel with an unreached tail stage reports zero users") {
    val e = Seq((1L, "signup", 0L)).toDF("user_id", "event_type", "sec")
    val got = BehaviorQueries.funnelStages(e, Seq("signup", "click"), 10L)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got === Seq((1, "signup", 1L, 0L), (2, "click", 0L, 0L)))
  }
}
