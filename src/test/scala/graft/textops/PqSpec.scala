package graft.textops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Product quantization: deterministic codebooks, exact-nearest encode,
  * hand-checkable asymmetric (ADC) distances, near-neighbor recovery on
  * clustered data. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // 4 well-separated clusters in an 8-dim space (2 subspaces of 4)
  private lazy val vecs = {
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 5))
    (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def bruteNearest(sub: Array[Double],
                           cb: Map[Int, Array[Double]]): Int =
    cb.toSeq.map { case (cid, c) =>
      val d = sub.zip(c).map { case (a, b) =>
        val t = a.toFloat.toDouble - b.toFloat.toDouble; t * t
      }.sum
      (math.sqrt(d), cid)
    }.minBy(identity)._2

  test("encode assigns every subvector to its true nearest centroid") {
    val books = Similarity.pqTrain(vecs, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iterations = 2)
    assert(books.length === 2)
    val enc = Similarity.pqEncode(vecs, "embedding", books)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("__code_0"), col("__code_1"))
      .as[(Long, Seq[Double], Int, Int)].collect()
    enc.foreach { case (_, v, c0, c1) =>
      assert(c0 === bruteNearest(v.slice(0, 4).toArray, books(0)))
      assert(c1 === bruteNearest(v.slice(4, 8).toArray, books(1)))
    }
  }

  test("ADC distance equals the hand-computed reconstruction distance") {
    val books = Similarity.pqTrain(vecs, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iterations = 1)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val got = Similarity.pqTopK(vecs.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, k = 5, books)
      .as[(Long, Int, Int, Double)].collect()
    got.foreach { case (_, c0, c1, adc) =>
      def d2(sub: Range, cb: Map[Int, Array[Double]], cid: Int): Double = {
        val c = cb(cid)
        sub.zipWithIndex.map { case (qi, j) =>
          val t = q(qi).toFloat.toDouble - c(j).toFloat.toDouble; t * t
        }.sum
      }
      val want = math.sqrt(d2(0 until 4, books(0), c0) + d2(4 until 8, books(1), c1))
      assert(math.abs(adc - want) < 1e-12)
    }
  }

  test("PQ top-k surfaces the query's own cluster on clustered data") {
    val books = Similarity.pqTrain(vecs, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, iterations = 2)
    val q = vecs.filter(col("vec_id") === 8) // cluster 0 member
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val top = Similarity.pqTopK(vecs.filter(col("vec_id") =!= 8),
        "vec_id", "embedding", q, k = 10, books)
      .select("vec_id").as[Long].collect()
    // all 10 nearest-by-ADC share the query's cluster (ids ≡ 0 mod 4)
    assert(top.forall(_ % 4 === 0))
  }

  test("empty corpus is rejected loudly") {
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTrain(none, "vec_id", "embedding", dim = 8, m = 2, k = 4)
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
