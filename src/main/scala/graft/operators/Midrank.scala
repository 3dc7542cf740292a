package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-safe MIDRANKS (ties share the average rank) over a value axis —
  * the primitive under every rank statistic in the library (Mann–Whitney /
  * ROC AUC, Kruskal–Wallis, Spearman).
  *
  * The textbook plan is `rank() OVER (ORDER BY x)` + a tie count — a
  * global window that funnels every row through ONE task. But a midrank
  * is a pure function of the VALUE, not the row: midrank(x) = (# rows
  * with value < x) + (t(x)+1)/2. So the scale shape is:
  *
  *   1. groupBy(x) → tie counts t(x)           (one keyed shuffle)
  *   2. running sum of t over distinct x's      (two-phase [[PrefixSum]],
  *      range-partitioned — no single-partition collapse)
  *   3. join midranks back by x                 (one keyed shuffle)
  *
  * Both the per-value counts and the prefix sums are exact integers in
  * DECIMAL, so the (t+1)/2 midrank is an exact half-integer — identical
  * to what the single-window plan (and the DuckDB oracle) produces.
  */
object Midrank {

  /** Midrank per DISTINCT value of `valueCol`: (value, `out` midrank
    * DECIMAL(38,1), `tieOut` tie count LONG). Null values are excluded
    * (SQL rank semantics over non-null axes). */
  def perValue(df: DataFrame, valueCol: Column, out: String = "midrank",
               tieOut: String = "tie_count", partitions: Int = 32): DataFrame = {
    val grp = df.select(valueCol.as("__x")).filter(col("__x").isNotNull)
      .groupBy(col("__x"))
      .agg(count(lit(1)).cast(DecimalType(38, 1)).as("__t"))
    PrefixSum.withRunningSum(grp, Seq(col("__x")), col("__t"), "__cum",
        partitions)
      // inclusive running sum minus own count = # strictly-smaller rows
      .select(col("__x"),
        (col("__cum") - col("__t") + (col("__t") + 1) / 2)
          .cast(DecimalType(38, 1)).as(out),
        col("__t").cast("long").as(tieOut))
  }

  /** Attach each row's midrank over `valueCol` as column `out` — the
    * drop-in replacement for rank()+tiecount over a global window. */
  def attach(df: DataFrame, valueCol: Column, out: String = "midrank",
             partitions: Int = 32): DataFrame = {
    val mr = perValue(df, valueCol, out, "__tie", partitions)
      .withColumnRenamed("__x", "__mr_key")
    df.join(mr.select(col("__mr_key"), col(out)),
        valueCol === col("__mr_key"), "inner")
      .drop("__mr_key")
  }
}
