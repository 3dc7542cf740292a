package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT frequent items without shuffling the long tail: a per-partition
  * Misra-Gries candidate sweep, then exact counting of the (small)
  * candidate set only.
  *
  * Guarantee: with `k` counters per partition, any item whose partition
  * count exceeds n_p/k survives that partition's sketch; an item with
  * GLOBAL count > n/k must exceed n_p/k in at least one partition
  * (pigeonhole), so the union of survivors is a SUPERSET of every item
  * with global count > n/k — no false negatives. The exact groupBy then
  * runs over rows matching the ≤ partitions·k candidates (an isin
  * filter the scan can evaluate), so the heavy shuffle moves only
  * candidate rows, not the full long-tail distribution. Callers must
  * pick `k` ≥ n/minCount for the guarantee to cover their threshold —
  * enforced by requiring sketchK to dominate the observed ratio at
  * verification time.
  *
  * This is the one operator family where per-partition imperative state
  * beats relational form at scale: the decrement-counting sketch is not
  * expressible as an aggregate without materializing the full
  * per-item count first — exactly the shuffle it exists to avoid.
  */
object FrequentItems {

  /** Misra-Gries over one iterator: at most k live counters. */
  private[operators] def misraGries(it: Iterator[String], k: Int): Map[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k) counters(x) = 1L
      else {
        // decrement all; drop zeros (the classic all-counter decrement)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val v = counters(key) - 1L
          if (v == 0L) dead += key else counters(key) = v
        }
        dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }

  /** Exact (item, n) rows for every item with count ≥ minCount in
    * `items` (a single string column). `sketchK` bounds per-partition
    * sketch size; the n/sketchK > minCount misconfiguration (which
    * would void the no-false-negative guarantee) is rejected loudly. */
  def frequent(items: Dataset[String], minCount: Long,
               sketchK: Int = 4096): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(sketchK >= 1, s"sketchK must be >= 1, got $sketchK")
    val spark = items.sparkSession
    import spark.implicits._
    val cached = items.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cached.count()
    require(n / sketchK.toLong < minCount,
      s"sketchK=$sketchK too small for n=$n at minCount=$minCount: " +
        s"items with count in (${n / sketchK}, $minCount) could be missed; " +
        s"need sketchK > ${if (minCount > 0) n / minCount else n}")
    val candidates = cached.mapPartitions(it =>
        misraGries(it, sketchK).keysIterator)
      .distinct().collect()
    cached.toDF("item")
      .filter(col("item").isin(candidates.toSeq: _*))
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
