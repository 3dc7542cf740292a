package graft.textops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Incremental exact-similarity dedup (the prefix-filter family) against
  * the persisted posting index: the probe must (1) return exactly the
  * frozen-statistics rebuild's pairs restricted to batch ids — which,
  * when the boilerplate cap never binds, is exactly the full
  * [[Dedup.ngramJaccardPairs]] / [[Dedup.containmentPairs]] rebuild over
  * corpus ∪ batch — (2) read the index through partition-pruned scans,
  * and (3) honor the FROZEN-statistics contract: frequencies and the cap
  * are the build-time corpus's, not the union's.
  */
class PostingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // corpus: exact dups (0/1), near dups (2≈3), distinct docs. Batch:
  // 100 = exact re-ingest of 0, 101 = near dup of 4, 102/103 = a new
  // batch-internal near-dup cluster, 104 = novel, 105 = shingle-less
  private val corpusRows = Seq(
    (0L, "the quick brown fox jumps over the lazy dog in the warm morning sun"),
    (1L, "the quick brown fox jumps over the lazy dog in the warm morning sun"),
    (2L, "pack my box with five dozen liquor jugs before the long trip south"),
    (3L, "pack my box with five dozen liquor jugs before the long trip north"),
    (4L, "sphinx of black quartz judge my vow said the museum curator quietly"),
    (5L, "how vexingly quick daft zebras jump when the keeper opens the gate"))
  private val batchRows = Seq(
    (100L, "the quick brown fox jumps over the lazy dog in the warm morning sun"),
    (101L, "sphinx of black quartz judge my vow said the museum curator loudly"),
    (102L, "a completely fresh batch document about distributed query engines today"),
    (103L, "a completely fresh batch document about distributed query engines tonight"),
    (104L, "unrelated content with entirely different words nowhere near anything else"),
    (105L, "tiny doc"))
  private lazy val corpus = corpusRows.toDF("doc_id", "text")
  private lazy val batch = batchRows.toDF("doc_id", "text")

  private def freshWh(tag: String) = graft.etl.Warehouse(
    java.nio.file.Files.createTempDirectory(s"graft_ngidx_$tag").toString)

  private def build(wh: graft.etl.Warehouse, cap: Int = 1000): Unit =
    Dedup.ngramIndexPersist(corpus, "doc_id", "text", wh, "gold", "ng",
      shingleK = 3, maxShingleFreq = cap, nPostBuckets = 8, nSetBuckets = 4)

  private def pairSet(df: org.apache.spark.sql.DataFrame,
                      cols: (String, String, String)) =
    df.select(cols._1, cols._2, cols._3)
      .as[(Long, Long, Double)].collect().toSet

  test("jaccard increment == full rebuild restricted to batch ids") {
    val wh = freshWh("jpairs")
    build(wh) // cap never binds on this corpus → frozen == union stats
    val inc = pairSet(Dedup.ngramJaccardIncrementPairs(batch, "doc_id",
      "text", wh, "gold", "ng", threshold = 0.5),
      ("id_a", "id_b", "jaccard"))
    val rebuild = pairSet(Dedup.ngramJaccardPairs(
      corpus.unionByName(batch), "doc_id", "text",
      shingleK = 3, threshold = 0.5), ("id_a", "id_b", "jaccard"))
      .filter { case (a, b, _) => a >= 100L || b >= 100L }
    assert(inc === rebuild)
    assert(inc.exists { case (a, b, j) => a == 0L && b == 100L && j == 1.0 })
    assert(inc.exists { case (a, b, j) => a == 4L && b == 101L && j >= 0.5 })
    assert(inc.exists { case (a, b, _) => a == 102L && b == 103L })
    assert(inc.forall { case (a, b, _) => a >= 100L || b >= 100L })
  }

  test("containment increment == full rebuild restricted to batch ids") {
    val wh = freshWh("cpairs")
    build(wh)
    val inc = pairSet(Dedup.containmentIncrementPairs(batch, "doc_id",
      "text", wh, "gold", "ng", threshold = 0.8),
      ("id_src", "id_dst", "containment"))
    val rebuild = pairSet(Dedup.containmentPairs(
      corpus.unionByName(batch), "doc_id", "text",
      shingleK = 3, threshold = 0.8), ("id_src", "id_dst", "containment"))
      .filter { case (a, b, _) => a >= 100L || b >= 100L }
    assert(inc === rebuild)
    // exact re-ingest: containment 1.0 BOTH directions
    assert(inc.exists { case (s, d, c) => s == 0L && d == 100L && c == 1.0 })
    assert(inc.exists { case (s, d, c) => s == 100L && d == 0L && c == 1.0 })
    assert(inc.forall { case (s, d, _) => s >= 100L || d >= 100L })
  }

  test("probe scans are partition-pruned on sbucket and dbucket") {
    val wh = freshWh("prune")
    build(wh)
    val probe = Dedup.ngramJaccardIncrementPairs(batch, "doc_id", "text",
      wh, "gold", "ng", threshold = 0.5)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("sbucket"))
    assert(plan.contains("dbucket"))
  }

  test("statistics are FROZEN at build: union-crossing cap keeps pairs") {
    // cap = 2: the exact-dup shingles (corpus freq 2 from docs 0/1)
    // survive the build cap. The batch re-ingest (100) lifts their UNION
    // frequency to 3 > cap — a full rebuild over corpus ∪ batch at this
    // cap would empty those docs — but the frozen contract scores with
    // build-time frequencies: 100 still pairs with 0 and 1 at 1.0.
    val wh = freshWh("frozen")
    build(wh, cap = 2)
    val inc = pairSet(Dedup.ngramJaccardIncrementPairs(batch, "doc_id",
      "text", wh, "gold", "ng", threshold = 0.5),
      ("id_a", "id_b", "jaccard"))
    assert(inc.exists { case (a, b, j) => a == 0L && b == 100L && j == 1.0 })
    assert(inc.exists { case (a, b, j) => a == 1L && b == 100L && j == 1.0 })
  }

  test("append: probe after append == full rebuild over the union") {
    // cap never binds on these texts, so the frozen-statistics probe is
    // exactly the union rebuild restricted to batch2 ids — including
    // pairs against the APPENDED batch1 docs
    val wh = freshWh("append")
    build(wh)
    Dedup.ngramIndexAppend(batch, "doc_id", "text", wh, "gold", "ng")
    val batch2 = Seq(
      (300L, batchRows.find(_._1 == 102L).get._2), // exact copy of appended 102
      (301L, "genuinely novel follow up content sharing nothing with any earlier document"))
      .toDF("doc_id", "text")
    val inc = pairSet(Dedup.ngramJaccardIncrementPairs(batch2, "doc_id",
      "text", wh, "gold", "ng", threshold = 0.5),
      ("id_a", "id_b", "jaccard"))
    val rebuild = pairSet(Dedup.ngramJaccardPairs(
      corpus.unionByName(batch).unionByName(batch2), "doc_id", "text",
      shingleK = 3, threshold = 0.5), ("id_a", "id_b", "jaccard"))
      .filter { case (a, b, _) => a >= 300L || b >= 300L }
    assert(inc === rebuild)
    // 300 found its appended twin (and 102's near-dup cluster mate 103)
    assert(inc.exists { case (a, b, j) => a == 102L && b == 300L && j == 1.0 })
    assert(inc.exists { case (a, b, _) => a == 103L && b == 300L })
    assert(!inc.exists { case (a, b, _) => a == 301L || b == 301L })
  }

  test("increment keep: corpus wins, batch clusters collapse, singletons survive") {
    val wh = freshWh("keep")
    build(wh)
    val kept = Dedup.ngramJaccardIncrementKeep(batch, "doc_id", "text",
        wh, "gold", "ng", threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    // 100 (exact corpus dup) and 101 (near corpus dup) die; the new
    // cluster {102,103} keeps its min id with size 2; 104 is novel;
    // 105 has no shingles and survives as a singleton
    assert(kept === Map(102L -> 2L, 104L -> 1L, 105L -> 1L))
  }

  test("staleness: novel vocabulary trips a rebuild, in-distribution appends") {
    val wh = freshWh("stale")
    build(wh)
    // exact re-ingest: every shingle known — staleness 0, append path
    val inDist = Seq((400L, corpusRows.head._2)).toDF("doc_id", "text")
    val s0 = Dedup.ngramIndexStaleness(inDist, "doc_id", "text",
      wh, "gold", "ng").head()
    assert(s0.getDouble(2) === 0.0)
    assert(!Dedup.ngramRebuildIfStale(corpus, inDist, "doc_id", "text",
      wh, "gold", "ng"))
    // novel vocabulary: all shingle mass unseen — staleness 1, rebuild
    val novel = Seq((500L,
      "wholly novel vocabulary cluster zeta omega theta lambda sigma gamma delta"))
      .toDF("doc_id", "text")
    val s1 = Dedup.ngramIndexStaleness(novel, "doc_id", "text",
      wh, "gold", "ng").head()
    assert(s1.getDouble(2) === 1.0)
    assert(Dedup.ngramRebuildIfStale(corpus.unionByName(inDist), novel,
      "doc_id", "text", wh, "gold", "ng"))
    // the rebuild re-froze statistics at the new snapshot: the same
    // batch now reads fully in-distribution
    val s2 = Dedup.ngramIndexStaleness(novel, "doc_id", "text",
      wh, "gold", "ng").head()
    assert(s2.getDouble(2) === 0.0)
  }

  test("build-time cap drops boilerplate from corpus AND batch sets") {
    // cap = 1: the exact-dup class {0,1} caps out entirely (freq 2), so
    // the re-ingested copy 100 has no capped shingles either — no pair.
    // Singleton-shingle docs (4 vs 101) still pair.
    val wh = freshWh("cap1")
    build(wh, cap = 1)
    val inc = pairSet(Dedup.ngramJaccardIncrementPairs(batch, "doc_id",
      "text", wh, "gold", "ng", threshold = 0.5),
      ("id_a", "id_b", "jaccard"))
    assert(!inc.exists { case (a, b, _) => b == 100L || a == 100L })
    assert(inc.exists { case (a, b, j) => a == 4L && b == 101L && j >= 0.5 })
  }
}
