package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The corpus-curation pipeline as a CONTINUOUS ingest: the batch shape
  * (lang gate → quality gate → dedup → kept corpus; the curation100
  * probe / `pipe_corpus_curation` entry) recomposed over
  * [[Dedup.nearDedupIngestBatch]] so each micro-batch gates itself,
  * near-dedups against everything every earlier epoch kept, and lands
  * its survivors exactly-once — the end-to-end production shape of a
  * crawl feed at 100 TB, where "the corpus" is never rebuilt, only
  * appended to.
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

  /** One epoch: gate → incremental near-dedup ingest → funnel row.
    * Extracted from the foreachBatch closure so kill-and-replay is
    * directly testable (CurationStreamSpec). */
  def curationIngestBatch(b: DataFrame, epoch: Long, idCol: String,
      textCol: String, wh: graft.etl.Warehouse, layer: String,
      table: String, threshold: Double, langCode: String = "en",
      minQuality: Double = 0.5, broadcastDocLimit: Long = 200000L,
      compactEvery: Int = 0): Unit = {
    val spark = b.sparkSession
    import spark.implicits._
    val in = b.select(col(idCol).cast(LongType).as(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nIn = in.count()
      // the gates are single-scan codegen'd expressions (native langId /
      // qualityScore — the curation100-measured forms); one persisted
      // frame feeds both counts and the dedup stage
      val gated = in
        .filter(langId(col(textCol)) === langCode)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLang = gated.count()
      val qual = gated
        .filter(qualityScore(col(textCol)) >= minQuality)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQual = qual.count()
      Dedup.nearDedupIngestBatch(qual, epoch, idCol, textCol, wh, layer,
        table, threshold, broadcastDocLimit, compactEvery)
      val nKept = wh.read(spark, layer, s"${table}_kept")
        .filter(col("epoch") === epoch).count()
      wh.overwritePartitionsDynamic(
        Seq((nIn, nLang, nQual, nKept, epoch))
          .toDF("n_in", "n_lang", "n_quality", "n_kept", "epoch"),
        layer, s"${table}_funnel", Seq("epoch"))
      gated.unpersist(); qual.unpersist()
    } finally in.unpersist()
    ()
  }

  /** Bootstrap the curated corpus + its index from an initial corpus —
    * the one-time batch build the stream then appends to forever: gate
    * → [[Dedup.nearDedupKeep]] (the batch keep, min-id rep per cluster)
    * → [[Dedup.nearDedupIndexPersist]] over the SURVIVORS → the kept
    * sink and funnel rows land under epoch −1 (the base epoch streaming
    * epochs are disjoint from). */
  def curationBootstrap(initial: DataFrame, idCol: String,
      textCol: String, wh: graft.etl.Warehouse, layer: String,
      table: String, threshold: Double, shingleK: Int = 3,
      numHashes: Int = 32, bands: Int = 16, nBuckets: Int = 64,
      nSetBuckets: Int = 64, langCode: String = "en",
      minQuality: Double = 0.5, broadcastDocLimit: Long = 200000L): Unit = {
    val spark = initial.sparkSession
    import spark.implicits._
    val in = initial.select(col(idCol).cast(LongType).as(idCol),
        col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nIn = in.count()
      val gated = in.filter(langId(col(textCol)) === langCode)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLang = gated.count()
      val qual = gated.filter(qualityScore(col(textCol)) >= minQuality)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQual = qual.count()
      val keptDocs = qual.join(
          Dedup.nearDedupKeep(qual, idCol, textCol, shingleK, numHashes,
            bands, threshold, broadcastDocLimit)
            .withColumnRenamed("doc_id", idCol), idCol)
        .localCheckpoint(true)
      Dedup.nearDedupIndexPersist(keptDocs, idCol, textCol, wh, layer,
        table, shingleK, numHashes, bands, nBuckets, nSetBuckets)
      wh.overwritePartitionsDynamic(
        keptDocs.withColumn("epoch", lit(-1L)),
        layer, s"${table}_kept", Seq("epoch"))
      wh.overwritePartitionsDynamic(
        Seq((nIn, nLang, nQual, keptDocs.count(), -1L))
          .toDF("n_in", "n_lang", "n_quality", "n_kept", "epoch"),
        layer, s"${table}_funnel", Seq("epoch"))
      gated.unpersist(); qual.unpersist()
    } finally in.unpersist()
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
      broadcastDocLimit: Long = 200000L,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       epoch: Long) =>
        curationIngestBatch(b.toDF(), epoch, idCol, textCol, wh, layer,
          table, threshold, langCode, minQuality, broadcastDocLimit,
          compactEvery)
      }
      .start()
}
