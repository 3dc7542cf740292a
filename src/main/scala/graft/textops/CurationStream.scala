package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The corpus-curation pipeline as a CONTINUOUS ingest: the batch shape
  * (lang gate → quality gate → dedup → kept corpus; the curation100
  * probe / `pipe_corpus_curation` entry) recomposed over the
  * family-selected ingest loop ([[Dedup.nearDedupIngestBatch]] for the
  * MinHash band index, [[Dedup.ngramIngestBatch]] for the exact
  * posting index — [[CurationStream.DedupFamily]]) so each micro-batch
  * gates itself, dedups against everything every earlier epoch kept,
  * and lands its survivors exactly-once — the end-to-end production
  * shape of a crawl feed at 100 TB, where "the corpus" is never
  * rebuilt, only appended to.
  *
  * Per epoch the funnel observables land in `<table>_funnel`
  * (epoch, n_in, n_lang, n_quality, n_kept), keyed by epoch via dynamic
  * partition overwrite — the same exactly-once discipline as the sink
  * and index appends, so a replayed epoch overwrites its own funnel row
  * rather than double-counting.
  *
  * Equivalence to the batch run (probe-checked by `ScaleProbe
  * curationstream`): when near-dup clusters are cliques (replica-style
  * duplication — the dominant crawl shape) and batches arrive in id
  * order, the streamed kept set is IDENTICAL to the batch pipeline's
  * (min-id rep per cluster): the earliest epoch keeps the cluster's
  * min-id member and every later member dies against it. For
  * non-clique chains the stream's corpus-wins policy can keep an extra
  * member a full rebuild would collapse — the same stated divergence as
  * [[Dedup.nearDedupIncrementKeep]].
  */
object CurationStream {
  import TextFunctions._

  /** The dedup stage a curation pipeline pays for (r10 verdict: the
    * stream was hard-wired to MinHash; a production curator should be
    * able to pay for exactness). Both families share the identical
    * gate → keep → exactly-once sink composition — only the index and
    * its probe differ. */
  sealed trait DedupFamily
  /** MinHash band index ([[Dedup.nearDedupIngestBatch]]): sketch
    * recall — banding escape probability (1−s^r)^b, negligible at
    * real near-dup similarities — at the lowest probe cost. */
  case object MinHashFamily extends DedupFamily
  /** Exact prefix-filter posting index ([[Dedup.ngramIngestBatch]]):
    * ZERO recall loss under the index's frozen statistics, plus the
    * in-loop statistics-refresh cadence (`rebuildCheckEvery`). */
  case object ExactNgramFamily extends DedupFamily

  /** One epoch: gate → incremental dedup ingest (family-selected) →
    * funnel row. Extracted from the foreachBatch closure so
    * kill-and-replay is directly testable (CurationStreamSpec).
    * `rebuildCheckEvery` (exact family only) runs the frozen-statistics
    * staleness check on the gated batch every that-many epochs and
    * rebuilds the posting index over the `_kept` corpus when it trips
    * — the curated corpus IS the kept table, so the loop is
    * self-contained (no external base corpus needed). */
  def curationIngestBatch(b: DataFrame, epoch: Long, idCol: String,
      textCol: String, wh: graft.etl.Warehouse, layer: String,
      table: String, threshold: Double, langCode: String = "en",
      minQuality: Double = 0.5, broadcastDocLimit: Long = 200000L,
      compactEvery: Int = 0, family: DedupFamily = MinHashFamily,
      rebuildCheckEvery: Int = 0): Unit = {
    val spark = b.sparkSession
    import spark.implicits._
    val in = b.select(col(idCol).cast(LongType).as(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // gate frames release in `finally`: a throwing dedup stage or sink
    // write must not leak two MEMORY_AND_DISK frames per retried epoch
    // into CacheManager (r10 ADVICE — the per-epoch /tmp/blockmgr
    // growth class PersistTracker exists to eliminate)
    var gated: DataFrame = null
    var qual: DataFrame = null
    try {
      spark.sparkContext.setJobDescription("curation: gates")
      val nIn = in.count()
      // the gates are single-scan codegen'd expressions (native langId /
      // qualityScore — the curation100-measured forms); one persisted
      // frame feeds both counts and the dedup stage
      gated = in
        .filter(langId(col(textCol)) === langCode)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLang = gated.count()
      qual = gated
        .filter(qualityScore(col(textCol)) >= minQuality)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQual = qual.count()
      // nKept comes from the epoch's own checkpointed survivors, never
      // from reading the `_kept` sink back: an epoch (or bootstrap)
      // whose survivor set is empty writes no partition, and reading a
      // never-populated parquet dir fails on schema inference — which
      // would wedge every subsequent epoch (r10 ADVICE)
      val nKept = family match {
        case MinHashFamily =>
          Dedup.nearDedupIngestBatch(qual, epoch, idCol, textCol,
            wh, layer, table, threshold, broadcastDocLimit, compactEvery)
        case ExactNgramFamily =>
          Dedup.ngramIngestBatch(qual, epoch, idCol, textCol,
            wh, layer, table, threshold, broadcastDocLimit,
            compactEvery = compactEvery,
            rebuildCheckEvery = rebuildCheckEvery)
      }
      // epoch rides as data (the funnel's key); pepoch is the
      // partition/replay unit the cadence fold below collapses. A
      // pre-pepoch funnel (stream resumed across the layout change)
      // migrates first — one readdir when already migrated
      spark.sparkContext.setJobDescription("curation: funnel sink")
      Dedup.migratePepochLayout(spark, wh, layer, s"${table}_funnel")
      wh.overwritePartitionsDynamic(
        Seq((nIn, nLang, nQual, nKept, epoch, epoch))
          .toDF("n_in", "n_lang", "n_quality", "n_kept", "epoch", "pepoch"),
        layer, s"${table}_funnel", Seq("pepoch"))
      // the funnel folds on the same cadence as the index and the
      // `_kept` sink (the inner ingest batch compacts both): committed
      // epochs collapse into the base partition so a year of 5-minute
      // epochs leaves a bounded directory count, with the per-epoch
      // rows (epoch data column) intact — the one shared fold
      // implementation ([[Dedup.foldSinkPartitions]])
      if (compactEvery > 0 && epoch > 0 && epoch % compactEvery == 0)
        Dedup.foldSinkPartitions(spark, wh, layer, s"${table}_funnel",
          foldEpochsBelow = epoch)
    } finally {
      if (gated != null) gated.unpersist()
      if (qual != null) qual.unpersist()
      in.unpersist()
    }
    ()
  }

  /** Bootstrap the curated corpus + its index from an initial corpus —
    * the one-time batch build the stream then appends to forever: gate
    * → the family's batch keep ([[Dedup.nearDedupKeep]] /
    * [[Dedup.ngramJaccardKeep]], min-id rep per cluster) → the family's
    * index persist over the SURVIVORS → the kept sink and funnel rows
    * land under epoch −1 (the base epoch streaming epochs are disjoint
    * from). For the exact family, `numHashes`/`bands` are unused and
    * `nBuckets` keys the posting buckets; `maxShingleFreq` is the
    * frozen boilerplate cap. */
  def curationBootstrap(initial: DataFrame, idCol: String,
      textCol: String, wh: graft.etl.Warehouse, layer: String,
      table: String, threshold: Double, shingleK: Int = 3,
      numHashes: Int = 32, bands: Int = 16, nBuckets: Int = 64,
      nSetBuckets: Int = 64, langCode: String = "en",
      minQuality: Double = 0.5, broadcastDocLimit: Long = 200000L,
      family: DedupFamily = MinHashFamily,
      maxShingleFreq: Int = 1000): Unit = {
    val spark = initial.sparkSession
    import spark.implicits._
    val in = initial.select(col(idCol).cast(LongType).as(idCol),
        col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // gate frames release in `finally` — same leak class as the epoch
    // path (r10 ADVICE)
    var gated: DataFrame = null
    var qual: DataFrame = null
    try {
      val nIn = in.count()
      gated = in.filter(langId(col(textCol)) === langCode)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLang = gated.count()
      qual = gated.filter(qualityScore(col(textCol)) >= minQuality)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQual = qual.count()
      val keep = family match {
        case MinHashFamily =>
          Dedup.nearDedupKeep(qual, idCol, textCol, shingleK, numHashes,
            bands, threshold, broadcastDocLimit)
        case ExactNgramFamily =>
          Dedup.ngramJaccardKeep(qual, idCol, textCol, shingleK,
            threshold, maxShingleFreq, broadcastDocLimit)
      }
      val keptDocs = qual.join(
          keep.withColumnRenamed("doc_id", idCol), idCol)
        .localCheckpoint(true)
      family match {
        case MinHashFamily =>
          Dedup.nearDedupIndexPersist(keptDocs, idCol, textCol, wh, layer,
            table, shingleK, numHashes, bands, nBuckets, nSetBuckets)
        case ExactNgramFamily =>
          // the curation loop is this index's ONLY consumer and probes
          // Jaccard at exactly `threshold`, so the bootstrap opts into
          // the Jaccard-only layout: `_post` stores each doc's prefix
          // rows at the threshold floor — the measured ~(1 − t) cut of
          // the index's dominant table — and the in-loop statistics
          // re-freeze preserves the floor. Containment probes against
          // a curation index are rejected explicitly (they need the
          // full-postings layout a standalone ngramIndexPersist keeps
          // by default).
          Dedup.ngramIndexPersist(keptDocs, idCol, textCol, wh, layer,
            table, shingleK, maxShingleFreq, nBuckets, nSetBuckets,
            containment = false, tMinJaccard = threshold)
      }
      // STATIC partitioned overwrites: the bootstrap is the from-scratch
      // build, so it truncates any previous sink state (including a
      // pre-`pepoch` layout — re-bootstraps migrate cleanly) instead of
      // dynamic-merging into it
      wh.overwritePartitioned(
        keptDocs.withColumn("epoch", lit(-1L))
          .withColumn("pepoch", lit(-1L)),
        layer, s"${table}_kept", Seq("pepoch"))
      wh.overwritePartitioned(
        Seq((nIn, nLang, nQual, keptDocs.count(), -1L, -1L))
          .toDF("n_in", "n_lang", "n_quality", "n_kept", "epoch", "pepoch"),
        layer, s"${table}_funnel", Seq("pepoch"))
    } finally {
      if (gated != null) gated.unpersist()
      if (qual != null) qual.unpersist()
      in.unpersist()
    }
  }

  /** The continuously-running stream around [[curationIngestBatch]].
    * Same delivery contract as [[Dedup.nearDedupIngestStream]]:
    * effectively exactly-once — every write is epoch-keyed dynamic
    * overwrite and the dedup probe excludes its own epoch's index
    * rows. */
  def curationIngestStream(batches: DataFrame, idCol: String,
      textCol: String, wh: graft.etl.Warehouse, layer: String,
      table: String, threshold: Double, checkpointDir: String,
      langCode: String = "en", minQuality: Double = 0.5,
      broadcastDocLimit: Long = 200000L, compactEvery: Int = 0,
      family: DedupFamily = MinHashFamily, rebuildCheckEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       epoch: Long) =>
        curationIngestBatch(b.toDF(), epoch, idCol, textCol, wh, layer,
          table, threshold, langCode, minQuality, broadcastDocLimit,
          compactEvery, family, rebuildCheckEvery)
      }
      .start()
}
