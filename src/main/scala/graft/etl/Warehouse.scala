package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Warehouse path layout + atomic table writes over plain Parquet.
  *
  * Layers are directories (`<root>/bronze|silver|gold|audit/<table>`),
  * the Spark analog of the reference's schemas (`init_database.sql:37-51`).
  *
  * Parquet has no transactional MERGE/DELETE (no Delta/Iceberg jars in this
  * build), so every mutation is a functional rebuild + [[overwrite]]:
  * write to `<table>._tmp`, then swap directories. Readers-of-own-input
  * rebuilds (SCD merges read the table they replace) MUST go through
  * [[rebuild]], which materializes the new content before the swap —
  * otherwise the lazy plan would scan a half-deleted input at action time.
  * At cluster scale the same contract holds with an object-store rename.
  */
final case class Warehouse(root: String) {

  def path(layer: String, table: String): String = s"$root/$layer/$table"

  def read(spark: SparkSession, layer: String, table: String): DataFrame = {
    recoverIfCrashed(layer, table)
    spark.read.parquet(path(layer, table))
  }

  def exists(layer: String, table: String): Boolean =
    Files.exists(Paths.get(path(layer, table)))

  /** Truncate-and-load (S2): plain overwrite, no self-read involved. */
  def overwrite(df: DataFrame, layer: String, table: String): Unit =
    df.write.mode("overwrite").parquet(path(layer, table))

  /** Partitioned overwrite for the year-partitioned fact
    * (ddl_gold.sql:78-103 → `partitionBy`, giving Catalyst partition
    * pruning on year predicates). */
  def overwritePartitioned(df: DataFrame, layer: String, table: String,
                           partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(path(layer, table))

  def append(df: DataFrame, layer: String, table: String): Unit =
    df.write.mode("append").parquet(path(layer, table))

  /** Partitioned append — new rows land in their partition directories
    * without touching existing files (the index-maintenance primitive:
    * ingest survivors join a persisted index in place). */
  def appendPartitioned(df: DataFrame, layer: String, table: String,
                        partCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partCols: _*)
      .parquet(path(layer, table))

  /** Idempotent partitioned append via DYNAMIC partition overwrite: only
    * the partitions present in `df` are replaced, everything else is
    * untouched — so a replayed write of the same keyed data (an epoch
    * retry) overwrites its own partitions instead of double-appending.
    * [[graft.streaming.EventStream.exactlyOnceBatchWriter]]'s discipline
    * as a warehouse primitive; the caller keys `partCols` by the replay
    * unit (e.g. an `epoch` column). */
  def overwritePartitionsDynamic(df: DataFrame, layer: String,
                                 table: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path(layer, table))

  /** Compaction — the columnstore REORGANIZE analog
    * (proc_load_silver.sql:277-283): rewrite a table into `targetFiles`
    * files so accumulating small appends don't degrade scan parallelism
    * (at cluster scale: size files to ~HDFS-block units). */
  def compact(spark: SparkSession, layer: String, table: String,
              targetFiles: Int): Unit =
    rebuild(read(spark, layer, table).coalesce(targetFiles), layer, table)

  /** Clustered compaction — the CLUSTERED COLUMNSTORE analog
    * (ddl_silver.sql:83-86): repartition on the cluster keys, sort rows
    * within each file by them, and rewrite. Parquet stores per-row-group
    * min/max stats, so point/range predicates on the cluster keys skip
    * whole row groups at scan time — data skipping without any table
    * format, and the co-partitioned layout doubles as a shuffle-free
    * input for downstream joins on the same keys. */
  def compactClustered(spark: SparkSession, layer: String, table: String,
                       targetFiles: Int, clusterCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    rebuild(read(spark, layer, table)
      .repartition(targetFiles, cols: _*)
      .sortWithinPartitions(cols: _*), layer, table)
  }

  /** Atomic rebuild of a table whose new content is derived from its own
    * current content: materialize to a tmp dir, swap, drop the old copy. */
  def rebuild(df: DataFrame, layer: String, table: String): Unit = {
    val tmp = Paths.get(path(layer, table + "._tmp"))
    df.write.mode("overwrite").parquet(tmp.toString)
    swapIn(layer, table, tmp)
  }

  /** [[rebuild]] preserving a partition layout — the compaction path
    * for partitioned-append tables (persisted indexes): rewrite into
    * the same `partitionBy` directories, then swap atomically. */
  def rebuildPartitioned(df: DataFrame, layer: String, table: String,
                         partCols: Seq[String]): Unit = {
    val tmp = Paths.get(path(layer, table + "._tmp"))
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(tmp.toString)
    swapIn(layer, table, tmp)
  }

  /** Swap a fully-written tmp dir into place: rename the live table
    * aside, rename tmp in, then delete the old copy. The no-table window
    * is a single rename (old→aside ↔ tmp→live), not the delete-then-move
    * gap the naive form had (r9 ADVICE) — and a crash INSIDE that window
    * is recoverable, not just reclaimable: [[recoverIfCrashed]] (run on
    * every read and on swap entry) restores `._old` to the live path
    * whenever the live table is missing, so a restart after a mid-swap
    * crash reads the pre-swap content instead of failing (r10 ADVICE).
    * `._old` is only deleted after tmp→live succeeded. */
  private def swapIn(layer: String, table: String,
                     tmp: java.nio.file.Path): Unit = {
    val target = Paths.get(path(layer, table))
    val old = Paths.get(path(layer, table + "._old"))
    recoverIfCrashed(layer, table)
    // any ._old still present is stale (its swap completed: the live
    // table exists) — reclaim before taking its name
    if (Files.exists(old)) deleteRecursively(old)
    if (Files.exists(target))
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
  }

  /** Crash recovery for [[swapIn]]'s single-rename window: a live table
    * that vanished while its `._old` copy survives means a swap died
    * between the two renames — restore the old copy. One existence
    * check per read; at cluster scale the same contract holds with
    * object-store list/rename. */
  private def recoverIfCrashed(layer: String, table: String): Unit = {
    val target = Paths.get(path(layer, table))
    val old = Paths.get(path(layer, table + "._old"))
    if (!Files.exists(target) && Files.exists(old))
      Files.move(old, target, StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
