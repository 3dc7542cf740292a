package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.TestSessions

/** Misra-Gries candidate sweep: no-false-negative guarantee vs exact
  * counts on skewed random data, misconfiguration rejection. */
class FrequentItemsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
    LazyList.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .take(n).toList

  // zipf-ish: item i drawn with weight ~ 1/(i+1)
  private val zipfGen: Gen[String] =
    Gen.frequency((1 to 40).map(i => (1000 / i, Gen.const(s"item$i"))): _*)

  test("frequent() equals the exact heavy-hitters groupBy on skewed data") {
    for (seed <- Seq(11L, 99L)) {
      val data = samples(zipfGen, 4000, seed)
      val minCount = 40L
      val got = FrequentItems.frequent(
          data.toDS().repartition(7), minCount, sketchK = 256)
        .as[(String, Long)].collect().toMap
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).toMap
      assert(got === exact, s"seed=$seed")
    }
  }

  test("per-partition sketch survives the guarantee bound") {
    // n/k = 4000/256 ≈ 15 < minCount 40: every true heavy hitter must
    // appear among candidates regardless of partition layout
    val data = samples(zipfGen, 4000, 7L)
    for (parts <- Seq(1, 3, 13)) {
      val got = FrequentItems.frequent(
          data.toDS().repartition(parts), 40L, sketchK = 256)
        .as[(String, Long)].collect().toMap
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 40L).toMap
      assert(got === exact, s"parts=$parts")
    }
  }

  test("a sketch too small for the threshold is rejected loudly") {
    val data = (0 until 1000).map(i => s"x${i % 50}")
    intercept[IllegalArgumentException] {
      FrequentItems.frequent(data.toDS(), minCount = 2L, sketchK = 4)
    }
  }

  test("misraGries keeps at most k counters and every true majority item") {
    val stream = List.fill(300)("a") ++ List.fill(200)("b") ++
      (0 until 400).map(i => s"noise$i")
    val sketch = FrequentItems.misraGries(stream.iterator, 10)
    assert(sketch.size <= 10)
    // count > n/k = 900/10 = 90: both a and b must survive
    assert(sketch.contains("a") && sketch.contains("b"))
  }
}
