package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSessions

/** Degree-ordered triangle counting: known graphs, duplicate/reversed
  * edge normalization, and a brute-force cross-check. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def triCount(edges: Seq[(Long, Long)]): Long =
    Triangles.stats(edges.toDF("a", "b"), "a", "b")
      .select("n_triangles").as[Long].head()

  test("K4 has 4 triangles, path and star have none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triCount(k4) === 4L)
    assert(triCount(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === 0L)
    assert(triCount((1L to 5L).map(i => (0L, i))) === 0L)
  }

  test("duplicate, reversed and self-loop edges normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
                    (4L, 4L))
    val row = Triangles.stats(messy.toDF("a", "b"), "a", "b")
      .select("n_nodes", "n_edges", "n_triangles")
      .as[(Long, Long, Long)].head()
    assert(row === ((3L, 3L, 1L)))
  }

  test("triangle rows list each triangle exactly once") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val rows = Triangles.triangles(k4.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => Set(x, y, z) }
    assert(rows.length === 4)
    assert(rows.toSet === Set(Set(0L, 1L, 2L), Set(0L, 1L, 3L),
                              Set(0L, 2L, 3L), Set(1L, 2L, 3L)))
  }

  test("matches brute force on a pseudo-random graph") {
    // deterministic edge soup over 24 nodes
    val edges = (0 until 120).map { i =>
      val a = (i * 7 + 3) % 24; val b = (i * 13 + 5) % 24
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    var brute = 0L
    for (i <- nodes.indices; j <- (i + 1) until nodes.size;
         k <- (j + 1) until nodes.size) {
      val (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if (es((a, b)) && es((b, c)) && es((a, c))) brute += 1
    }
    assert(triCount(edges) === brute)
  }
}
