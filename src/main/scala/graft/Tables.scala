package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.parquet` has shipped with two physical layouts for `ts`:
    * parquet TIMESTAMP(NANOS) (surfacing as Long nanoseconds under the
    * legacy flag) and TIMESTAMP(MICROS) (surfacing as TimestampType /
    * TIMESTAMP_NTZ). This loader inspects the footer schema and
    * normalizes BOTH to the engine's internal convention — `ts` as Long
    * NANOSECONDS since epoch — so every downstream `ts div 1000` /
    * `ts div 1e9` site is layout-independent. Never assume a physical
    * type the footer doesn't confirm.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Schema-adaptive events read, normalized to `ts: Long` (nanos). */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    // harmless when ts is micros; required to read a NANOS file at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw // physical NANOS → already Long ns
      case TimestampNTZType | TimestampType =>
        // NTZ→TZ cast is exact under the engine's UTC session timezone
        // (set in every entry point); ×1000 back to ns keeps all
        // downstream integer arithmetic unchanged and loss-free.
        raw.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other")
    }
  }

  /** Nanosecond-long → TimestampType (µs). Integer `div` keeps full
    * precision — a double division of ~1.7e18 ns would lose the µs tail.
    * Valid on any [[load]]-read events frame: the loader guarantees ns. */
  def eventTs(colName: String = "ts"): Column =
    timestamp_micros(expr(s"$colName div 1000"))

  /** Register every table as a temp view named after the file, so both
    * spark.sql(...) entry points and the DataFrame API see one catalog. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
