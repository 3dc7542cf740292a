package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two 16-bit
  * dimension keys so rows close in BOTH dimensions land close in the
  * one-dimensional sort order. Written sorted by the z-value, each file /
  * row-group covers a narrow rectangle of (dim1, dim2) space, so min/max
  * stats prune scans filtered on EITHER dimension — the multi-column
  * clustering the reference approximates with its single-column join-key
  * indexes, re-expressed as a layout Spark's parquet reader exploits.
  *
  * Pure bit arithmetic (shift/and/or magic-number spreads) — codegen'd
  * end-to-end, no UDFs, reproducible in any engine with 64-bit ints.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit lane: abcd → 0a0b0c0d. The classic Morton magic-number
    * cascade; each step doubles the gap between occupied bits. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x in even bits, y in odd —
    * the native codegen expression (one fused call per row; see
    * graft.functions.ZOrderKey). */
  def interleave16(x: Column, y: Column): Column =
    graft.functions.ZOrderExpressions.zorder_key(
      x.cast("long"), y.cast("long"))

  /** Built-ins-only twin of [[interleave16]] — the reference the native
    * expression is spec-tested against (and the form the DuckDB oracle
    * mirrors arithmetically). */
  def interleave16Composable(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` clustered by the z-order of (xCol, yCol): range-partition
    * on the z-value (so files tile z-space contiguously) and sort within
    * partitions (so row-group min/max stats are tight). `numFiles` is the
    * target layout width — at cluster scale, one file per executor-sized
    * chunk. */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
                    path: String, numFiles: Int): Unit = {
    val z = interleave16(xCol, yCol).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
