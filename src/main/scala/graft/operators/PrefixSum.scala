package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) sum over a GLOBAL ordering — the
  * scale-safe form of `Window.orderBy(...)` with no partition spec,
  * which otherwise funnels the whole input through one task.
  *
  * Shape: range-partition on the sort key (a parallel sort, the same
  * exchange `orderBy` plans), take each row's running sum WITHIN its
  * range partition, then add the exclusive prefix of per-partition
  * totals — `numPartitions` scalars collected to the driver (the same
  * bounded driver state as `etl.SurrogateKeys`' two-phase row_number).
  * Two exchanges instead of one single-task sort: the right trade at
  * any data-scaled cardinality.
  *
  * The summed column must be decimal-typed by the caller when exactness
  * matters — the per-partition window, the driver-side prefix fold
  * (BigDecimal), and the final add then stay exact under any partition
  * layout.
  */
object PrefixSum {

  /** Append `out` = running sum of `valueCol` over the total order
    * `sortCols` (which must be duplicate-free to make the prefix sum
    * well-defined). */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                     out: String, partitions: Int = 32): DataFrame = {
    require(sortCols.nonEmpty, "withRunningSum needs a sort order")
    val spark = df.sparkSession
    // localCheckpoint pins the range layout: the offsets job and the
    // window job BOTH read these exact partitions. Re-executing the
    // range exchange in each job would re-sample partition boundaries,
    // and a boundary that moves between the two jobs silently corrupts
    // every offset after it (observed at sf0.1 before this barrier).
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__run", sum(valueCol).over(w))
    val totals = local.groupBy("__pid")
      .agg(sum(valueCol).as("__tot")).collect()
      .map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO
    val offsets = totals.map { case (pid, tot) =>
      val off = acc
      acc = acc.add(if (tot == null) java.math.BigDecimal.ZERO else tot)
      (pid, off)
    }
    val offDf = spark.createDataFrame(
      offsets.toSeq.map { case (pid, off) => (pid, off.toPlainString) })
      .toDF("__pid", "__off")
    val runType = local.schema("__run").dataType
    local.join(broadcast(offDf), "__pid")
      .withColumn(out, col("__run") + col("__off").cast(runType))
      .drop("__pid", "__run", "__off")
  }

  /** Append `out` = running MAX of long-typed `valueCol` over the total
    * order `sortCols` — same two-exchange range-partition shape as
    * [[withRunningSum]] (max is associative, so per-partition scan +
    * broadcast prefix-of-partition-maxima composes identically).
    *
    * With `inclusive = false` the scan is EXCLUSIVE — each row sees the
    * max over STRICTLY-PRECEDING rows only (null when none precede):
    * the per-partition window ends at -1 and the partition offset is
    * itself exclusive, so the strict-prefix semantics hold across
    * partition boundaries too. The exclusive form is what dominance /
    * skyline pruning consumes ("best value among everything ranked
    * ahead of me"), which no single inclusive pass can answer when sort
    * keys tie. */
  def withRunningMaxLong(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                         out: String, inclusive: Boolean = true,
                         partitions: Int = 32): DataFrame = {
    require(sortCols.nonEmpty, "withRunningMaxLong needs a sort order")
    val spark = df.sparkSession
    // same layout-pinning barrier as withRunningSum: offsets job and
    // window job must read identical range partitions
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val hi = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    val local = ranged.withColumn("__run", max(valueCol).over(w))
    val totals = local.groupBy("__pid")
      .agg(max(valueCol).cast("long").as("__tot")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var acc: Option[Long] = None
    val offsets = totals.map { case (pid, tot) =>
      val off = acc
      acc = (acc.toSeq ++ tot.toSeq).reduceOption(math.max(_: Long, _: Long))
      (pid, off)
    }
    val offDf = spark.createDataFrame(
      offsets.toSeq.map { case (pid, off) =>
        (pid, off.map(_.toString).orNull) })
      .toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn(out,
        greatest(col("__run").cast("long"), col("__off").cast("long")))
      .drop("__pid", "__run", "__off")
  }
}
