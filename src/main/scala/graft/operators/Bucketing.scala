package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the Parquet answer to the reference's
  * nonclustered join-key indexes (`ddl_silver.sql:36-37,88-93`; SURVEY.md
  * §4): pre-hash-partition both tables into the same bucket layout at
  * write time so repeated joins/aggregations on the bucket key skip their
  * shuffle entirely.
  *
  * On a 1000-executor cluster this converts the fact-to-fact or
  * fact-to-large-dim join from a full network shuffle of the big table
  * (the dominant cost at 100 TB) into a local zip of matching buckets.
  * Bucket counts should be sized so each bucket ≈ one HDFS-block-ish unit
  * per join task.
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (sorted within buckets so
    * merge-join needs no sort either). Overwrites any existing table —
    * including a previous JVM's orphaned managed-table DIRECTORY: with
    * an in-memory catalog the metastore forgets the table across
    * sessions while its location survives, and saveAsTable refuses to
    * reuse an existing location, so the stale directory is cleared
    * first (DROP TABLE alone cannot see it). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) new java.io.File(wh.toString)
      else new java.io.File(wh),
      table.toLowerCase)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
      f.delete()
    }
    if (loc.exists()) del(loc)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key. With matching
    * bucket specs Catalyst plans a SortMergeJoin with NO Exchange on
    * either side (verified in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
