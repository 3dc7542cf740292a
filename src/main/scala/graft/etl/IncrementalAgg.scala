package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of pre-aggregated gold tables: merge a
  * delta's PARTIAL aggregates into the existing aggregate instead of
  * re-scanning the fact history (the 100 TB form of the reference's
  * gold rollups — only the arriving partitions are ever read).
  *
  * Counts and decimal-routed sums are associative and commutative, so
  * re-aggregating the union of partial rows is EXACTLY the from-scratch
  * aggregate — the same algebra Spark's map-side combine exploits,
  * lifted to table maintenance. Derived measures (averages, ratios)
  * must be recomputed FROM the merged primitives, never merged
  * themselves; [[withDerived]] is that second step.
  */
object IncrementalAgg {

  /** Merge aggregate tables sharing (keys ++ counts ++ sums) schemas:
    * any number of partials (base table + one or more deltas) combine
    * by summing measure columns per key. */
  def merge(partials: Seq[DataFrame], keys: Seq[String],
            counts: Seq[String], sums: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "merge needs at least one partial")
    val measures =
      counts.map(c => sum(col(c)).cast("long").as(c)) ++
        sums.map(c => sum(col(c)).as(c))
    partials.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(measures.head, measures.tail: _*)
  }

  /** Recompute ratio-style derived measures from merged primitives. */
  def withDerived(merged: DataFrame,
                  derived: Seq[(String, Column)]): DataFrame =
    derived.foldLeft(merged) { case (df, (name, expr)) =>
      df.withColumn(name, expr)
    }
}
