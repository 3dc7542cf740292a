package graft.textops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Directed containment + semantic (k-means cell) dedup: ground truth
  * on constructed corpora. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val inner = (1 to 10).map(i => s"w$i").mkString(" ")

  test("containment flags the quoted doc, not the quoting doc") {
    val docs = Seq(
      (1L, inner),                                // quoted verbatim in 2
      (2L, s"prefix padding here $inner and a long suffix trails on"),
      (3L, "completely different words nothing shared at all today")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.8)
      .select("id_src", "id_dst").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L))) // 1 ⊂ 2; 2 ⊄ 1; 3 unrelated
  }

  test("identical docs contain each other; score is exactly 1.0") {
    val docs = Seq((1L, inner), (2L, inner)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("prefix filter loses no recall vs the unfiltered join") {
    // corpus with overlapping docs at varied containment levels
    val words = (1 to 40).map(i => s"t$i")
    val docs = (0 until 12).map { d =>
      (d.toLong, words.slice(d, d + 12 + d % 4).mkString(" "))
    }.toDF("doc_id", "text")
    def brute(t: Double): Set[(Long, Long)] = {
      val sh = Dedup.shingledHashed(docs, "doc_id", "text", 3)
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).toSet }
      (for {
        (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
        c = (sa & sb).size.toDouble / sa.size if c >= t
      } yield (a, b)).toSet
    }
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.5)
      .select("id_src", "id_dst").as[(Long, Long)].collect().toSet
    assert(got === brute(0.5))
  }

  test("component-grouped containment ≡ broadcast ≡ forced fallback") {
    val words = (1 to 40).map(i => s"t$i")
    val docs = (0 until 12).map { d =>
      (d.toLong, words.slice(d, d + 12 + d % 4).mkString(" "))
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_src", "id_dst", "containment")
        .as[(Long, Long, Double)].collect().toSet
    val viaBroadcast = rows(Dedup.containmentPairs(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5))
    val viaGroup = rows(Dedup.containmentPairs(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5, broadcastDocLimit = 0L))
    assert(viaGroup === viaBroadcast)
    // cap=1 marks every component oversized → the pairwise fallback
    // must still produce the identical row set (routing, not semantics)
    val viaFallback = rows(Dedup.containmentPairs(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5, broadcastDocLimit = 0L,
      maxComponentShingles = 1L))
    assert(viaFallback === viaBroadcast)
    assert(viaBroadcast.nonEmpty)
  }

  test("semantic dedup pairs near-identical vectors within cells") {
    // three well-separated axis clusters, 3 vectors each, plus noise dims
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until 8).map(i => if (i == axis) 1.0f else if (i == 7) eps else 0.0f)
    // vec_ids interleave clusters so the deterministic init (lowest
    // nlist ids) seeds one centroid per cluster
    val rows = (0 until 9).map { i =>
      (i.toLong, v(i % 3, 0.01f * (i / 3)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = Similarity.semanticDupPairs(rows, "vec_id", "embedding",
        dim = 8, nlist = 3, iterations = 2, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every same-cluster pair, no cross-cluster pair
    val want = (for (c <- 0 until 3; i <- 0 until 3; j <- (i + 1) until 3)
      yield ((c + 3 * i).toLong, (c + 3 * j).toLong)).toSet
    assert(got === want)
  }
}
