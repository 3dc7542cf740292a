package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global RANK()-with-ties top-k without an unpartitioned sort of the
  * full input (ref: `scripts/Data Analytics/06_ranking_analysis.sql:27-38`
  * — `RANK() OVER (ORDER BY ...) <= k`, ties kept).
  *
  * A bare `rank().over(Window.orderBy(...))` moves EVERY row to one task
  * — fine at dim cardinality, a driver-adjacent bottleneck at 100× that.
  * Two phases make it scale-safe with identical semantics:
  *
  *  1. local prune — rank within each physical partition (window keyed
  *     on `spark_partition_id()`: a parallel exchange + per-task sort).
  *     For any row, the strictly-greater rows in its own partition are a
  *     subset of its strictly-greater rows globally, so
  *     partitionRank ≤ globalRank — filtering partitionRank ≤ k keeps a
  *     SUPERSET of the global top-k, ties included, with no value-
  *     distribution assumptions;
  *  2. global rank — the exact unpartitioned window, now over at most
  *     k·numPartitions survivors instead of the whole input.
  */
object TopK {

  /** Rows whose global `rank()` over `order` is ≤ k, with that rank
    * appended as `rankCol` (IntegerType, like `rank()` itself). */
  def rankTopK(df: DataFrame, k: Int, order: Seq[Column],
               rankCol: String = "rnk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(order.nonEmpty, "rankTopK needs at least one ordering column")
    val pruned = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local_rnk",
        rank().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .filter(col("__local_rnk") <= k)
      .drop("__pid", "__local_rnk")
    pruned
      .withColumn(rankCol, rank().over(Window.orderBy(order: _*)))
      .filter(col(rankCol) <= k)
  }
}
