package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSessions

/** Fixed-iteration PageRank: uniform graphs, reference-implementation
  * cross-check, sink rejection, partitioning invariance. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges ++ edges.map(_.swap)

  private def got(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.ranks(edges.toDF("a", "b"), "a", "b", iterations = iters)
      .as[(Long, Double)].collect().toMap

  /** In-memory reference: same damping, same fixed iterations. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val out = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = es.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters)
      rank = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).map(u => rank(u) / out(u)).sum
        v -> (0.15 / n + 0.85 * s)
      }.toMap
    rank
  }

  test("regular graphs stay uniform") {
    // symmetric 4-ring: every node has degree 2 → rank stays 1/4
    val ring = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(got(ring, 3).values.toSet === Set(0.25))
  }

  test("star concentrates rank on the hub, matching the reference") {
    val star = sym((1L to 5L).map(i => (0L, i)))
    val g = got(star, 3)
    val r = ref(star, 3)
    assert(g.keySet === r.keySet)
    g.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-9, s"node $k") }
    assert(g(0L) > g(1L) * 2) // hub dominates
    assert(math.abs(g.values.sum - 1.0) < 1e-6) // mass conserved
  }

  test("asymmetric graph matches the reference implementation") {
    val edges = sym(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 0L), (5L, 0L)))
    val g = got(edges, 4)
    val r = ref(edges, 4)
    g.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-9, s"node $k") }
  }

  test("directed sinks are rejected loudly") {
    intercept[IllegalArgumentException] {
      got(Seq((1L, 2L)), 2) // node 2 has no out-edge: rank mass would leak
    }
  }

  test("ranks are invariant under input partitioning") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)))
    val a = got(edges, 3)
    val b = PageRank.ranks(edges.toDF("a", "b").repartition(13), "a", "b", 3)
      .as[(Long, Double)].collect().toMap
    assert(a === b) // bit-identical, not approximately equal
  }
}
