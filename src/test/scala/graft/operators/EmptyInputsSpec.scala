package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions
import graft.textops.Dedup

/** Empty inputs must yield empty outputs, never throw: a pipeline over
  * a filtered partition (a new corpus, an empty delta, a quiet day)
  * routinely hands operators zero rows. */
class EmptyInputsSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")

  test("dedup family on an empty corpus") {
    assert(Dedup.exactDedup(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashLshVerified(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearPairs(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text").count() === 0)
  }

  test("null and empty text rows flow through the dedup family") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    // null/empty texts shingle to nothing → no pairs, no crash
    assert(Dedup.minhashLshVerified(docs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearPairs(docs, "doc_id", "text").count() === 0)
    // exact dedup groups them (null hash and empty-string hash differ)
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() === 3)
  }

  test("connected components on an empty edge set") {
    assert(ConnectedComponents.components(noEdges, "a", "b").count() === 0)
    assert(ConnectedComponents.componentsStarContraction(noEdges, "a", "b")
      .count() === 0)
  }

  test("round-5 operators on empty inputs") {
    assert(Dedup.containmentPairs(noDocs, "doc_id", "text").count() === 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.textops.Similarity.semanticDupPairs(
      noVecs, "vec_id", "embedding", dim = 8, nlist = 3).count() === 0)
    // triangle stats degrade to a single all-zero row, not an error
    val stats = Triangles.stats(noEdges, "a", "b")
      .as[(Long, Long, Long)].head()
    assert(stats === ((0L, 0L, 0L)))
    assert(PageRank.ranks(noEdges, "a", "b", iterations = 2).count() === 0)
    val noEvents = Seq.empty[(Long, String, Long)]
      .toDF("user_id", "event_type", "sec")
    val funnel = graft.analytics.BehaviorQueries.funnelStages(
      noEvents, Seq("signup", "click"), 10L)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(funnel === Seq((1, "signup", 0L, 0L), (2, "click", 0L, 0L)))
    assert(graft.analytics.BehaviorQueries.retentionMatrix(
      noEvents.withColumnRenamed("sec", "day"), "signup").count() === 0)
    assert(graft.analytics.BehaviorQueries.basketAffinity(
      Seq.empty[(Long, Long)].toDF("bk", "it"), "bk", "it", 2L).count() === 0)
  }

  test("rank top-k, as-of join, salted join on empty inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(TopK.rankTopK(empty, 5, Seq(col("v").desc)).count() === 0)
    val l = Seq.empty[(Long, Long, Long)].toDF("k", "t", "lid")
    val r = Seq.empty[(Long, Long, Long)].toDF("k", "t", "rid")
    assert(AsOfJoin.asOf(l, r, "k", "t").count() === 0)
    val probe = Seq.empty[(Long, String)].toDF("k", "pk")
    val build = Seq.empty[(Long, String)].toDF("k", "label")
    assert(SkewJoin.saltedJoin(probe, build, Seq("k"), "pk").count() === 0)
    // nonempty probe against empty build: left join keeps probe rows
    val probe2 = Seq((1L, "x")).toDF("k", "pk")
    assert(SkewJoin.saltedJoin(probe2, build, Seq("k"), "pk",
      joinType = "left").count() === 1)
  }
}
