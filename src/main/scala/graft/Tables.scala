package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access to the driver-generated testdata tables (TESTDATA.md):
  * TPC-H-ish star schema (`region nation customer supplier part orders
  * lineitem`) plus `events`, `documents`, `embeddings`.
  *
  * All reads are plain Parquet scans so Catalyst pushes filters/column
  * pruning straight into the file source — callers should `.select` early
  * and let the optimizer do the rest.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` carries parquet TIMESTAMP(NANOS) which Spark rejects
    * by default ([PARQUET_TYPE_ILLEGAL]); with the legacy flag it surfaces
    * as Long nanoseconds — convert with [[eventTs]].
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Nanosecond-long → TimestampType (µs). Integer `div` keeps full
    * precision — a double division of ~1.7e18 ns would lose the µs tail. */
  def eventTs(colName: String = "ts"): Column =
    timestamp_micros(expr(s"$colName div 1000"))

  /** Register every table as a temp view named after the file, so both
    * spark.sql(...) entry points and the DataFrame API see one catalog. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
