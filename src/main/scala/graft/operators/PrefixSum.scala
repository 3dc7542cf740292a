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
}
