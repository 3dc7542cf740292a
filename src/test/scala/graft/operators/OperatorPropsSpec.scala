package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Property-style checks pitting the distributed operators against
  * in-memory brute-force references on randomized inputs. Raw ScalaCheck
  * generators with fixed seeds (no scalatestplus bridge offline). */
class OperatorPropsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    LazyList.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
      .take(n).toList

  // ---- AsOfJoin vs brute force -------------------------------------

  private val rowGen = for {
    k <- Gen.choose(0L, 4L)     // few keys → dense per-key series
    t <- Gen.choose(0L, 30L)    // small time range → frequent ties
  } yield (k, t)

  test("asOf equals the brute-force latest-at-or-before on random data") {
    val leftRows = samples(rowGen, 120).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val rightRows = samples(rowGen, 120).zipWithIndex
      .map { case ((k, t), i) => (k, t, 1000L + i) }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid")

    val got = AsOfJoin.asOf(left, right, "k", "t")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

    // brute force: max (t, rid) among right rows with same k, t <= left.t;
    // the operator's tie rule is max payload struct == max rid here
    val brute = leftRows.map { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got === brute)
  }

  // ---- ConnectedComponents vs union-find ---------------------------

  private val edgeGen = for {
    a <- Gen.choose(0L, 30L)
    b <- Gen.choose(0L, 30L) if a != b
  } yield (a, b)

  test("components equal a union-find reference on random graphs") {
    val edges = samples(edgeGen, 60).distinct
    val got = ConnectedComponents.components(
      edges.toDF("a", "b"), "a", "b", maxIterations = 40)
      .as[(Long, Long)].collect().toMap

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(x: Long, y: Long): Unit = parent(find(x)) = find(y)
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes
      .groupBy(find)
      .flatMap { case (_, members) => members.map(_ -> members.min) }
    assert(got === expected)
  }

  test("star contraction equals a union-find reference on random graphs") {
    val edges = samples(edgeGen, 80).distinct
    val got = ConnectedComponents.componentsStarContraction(
      edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(x: Long, y: Long): Unit = parent(find(x)) = find(y)
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes
      .groupBy(find)
      .flatMap { case (_, members) => members.map(_ -> members.min) }
    assert(got === expected)
  }

  // ---- hash split: pure function of the key ------------------------

  test("hash-split assignment is independent of row order and partitioning") {
    val ids = (0L until 500L).toDF("doc_id")
    def splitOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val b = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
      df.select(col("doc_id"), b.as("bucket"))
        .as[(Long, Long)].collect().toMap
    }
    assert(splitOf(ids) === splitOf(ids.repartition(17).orderBy(rand(5))))
  }

  // ---- two-phase TopK vs the naive global-rank window --------------

  test("rankTopK equals the unpartitioned rank window, ties kept, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    // heavy tie pressure: values drawn from a tiny domain
    val rows = samples(Gen.zip(Gen.choose(0L, 2000L), Gen.choose(0L, 9L)), 300)
      .zipWithIndex.map { case ((id, v), i) => (id + i, v) }
    val df = rows.toDF("id", "v")
    val naive = df
      .withColumn("rnk", rank().over(Window.orderBy(col("v").desc, col("id"))))
      .filter(col("rnk") <= 7)
      .select("id", "v", "rnk").as[(Long, Long, Int)].collect().toSet
    for (parts <- Seq(1, 3, 32)) {
      val got = TopK.rankTopK(df.repartition(parts), 7,
          Seq(col("v").desc, col("id")))
        .select("id", "v", "rnk").as[(Long, Long, Int)].collect().toSet
      assert(got === naive, s"parts=$parts")
    }
    // pure-tie ordering (every row rank 1) must keep everything
    val allTies = TopK.rankTopK(df.repartition(5), 1, Seq(lit(1)))
    assert(allTies.count() === rows.length.toLong)
  }

  // ---- Triangles vs brute force on random graphs -------------------

  test("triangle count equals brute force on random graphs") {
    for (seedOff <- 0 until 3) {
      val edges = LazyList.from(0)
        .flatMap(i => edgeGen.apply(Gen.Parameters.default,
          Seed(101L + seedOff * 1000 + i)))
        .take(80).toList.distinct
      val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toSet
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      var brute = 0L
      for (i <- nodes.indices; j <- (i + 1) until nodes.size;
           k <- (j + 1) until nodes.size)
        if (es((nodes(i), nodes(j))) && es((nodes(j), nodes(k))) &&
            es((nodes(i), nodes(k)))) brute += 1
      val got = Triangles.stats(edges.toDF("a", "b"), "a", "b")
        .select("n_triangles").as[Long].head()
      assert(got === brute, s"seedOff=$seedOff")
    }
  }

  // ---- PageRank invariants on random symmetric graphs --------------

  test("pagerank conserves mass and matches the reference on random graphs") {
    for (seedOff <- 0 until 3) {
      val raw = LazyList.from(0)
        .flatMap(i => edgeGen.apply(Gen.Parameters.default,
          Seed(577L + seedOff * 1000 + i)))
        .take(50).toList.distinct
      val edges = (raw ++ raw.map(_.swap)).distinct
      val got = PageRank.ranks(edges.toDF("a", "b"), "a", "b", iterations = 3)
        .as[(Long, Double)].collect().toMap
      // mass conservation: on sink-free graphs ranks sum to 1
      assert(math.abs(got.values.sum - 1.0) < 1e-6, s"seedOff=$seedOff")
      // reference implementation agreement
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      var rank = nodes.map(_ -> 1.0 / nodes.size).toMap
      for (_ <- 0 until 3)
        rank = nodes.map { v =>
          val s = in.getOrElse(v, Seq.empty).map(u => rank(u) / out(u)).sum
          v -> (0.15 / nodes.size + 0.85 * s)
        }.toMap
      got.foreach { case (k, v) =>
        assert(math.abs(v - rank(k)) < 1e-9, s"node $k seedOff=$seedOff")
      }
    }
  }

  // ---- containment vs brute force on random corpora ----------------

  test("containment pairs equal brute force on random corpora") {
    val wordGen = Gen.choose(0, 25).map(i => s"w$i")
    for (seedOff <- 0 until 2) {
      val docs = (0 until 15).map { d =>
        val words = LazyList.from(0)
          .flatMap(i => wordGen.apply(Gen.Parameters.default,
            Seed(331L + seedOff * 7919 + d * 131 + i)))
          .take(8 + d % 7).toList
        (d.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val sh = graft.textops.Dedup.shingledHashed(df, "doc_id", "text", 3)
        .as[(Long, Long)].collect().groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).toSet }
      val brute = (for {
        (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
        c = (sa & sb).size.toDouble / sa.size if c >= 0.6
      } yield (a, b)).toSet
      val got = graft.textops.Dedup.containmentPairs(df, "doc_id", "text",
          shingleK = 3, threshold = 0.6)
        .select("id_src", "id_dst").as[(Long, Long)].collect().toSet
      assert(got === brute, s"seedOff=$seedOff")
    }
  }
}
