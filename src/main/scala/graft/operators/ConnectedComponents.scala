package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate PAIRS into duplicate CLUSTERS (pick one
  * representative per component) in a dedup pipeline.
  *
  * Each round is one shuffle join (labels onto edge endpoints) plus a
  * min-aggregate; a component's minimum id floods outward one hop per
  * round, so rounds = O(max component diameter). Near-dup graphs are
  * unions of small cliques — diameters of 2-3 — so the loop converges in
  * a handful of rounds; for web-scale skewed graphs the same contract
  * would swap in the large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log n) rounds regardless of diameter.
  *
  * Convergence detection exploits monotonicity: labels only ever
  * decrease, so the exact (decimal) sum of labels strictly decreases on
  * any changing round — an unchanged sum IS the fixpoint. That makes
  * the per-round probe one tiny aggregate over the just-materialized
  * labels instead of a join against the previous round. Each round's
  * labels are localCheckpoint'ed: `labels` feeds the next round TWICE
  * (neighbor lookup + left join), so without cutting lineage the
  * logical plan doubles per round — exponential plan-string growth that
  * OOMs the driver before the data is ever large. On a cluster with
  * unreliable executors swap in reliable `checkpoint` (an HDFS write) —
  * same contract.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by (aCol, bCol) pairs.
    * Returns (id, component) for every node incident to an edge, where
    * `component` is the minimum node id reachable from `id`. */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 maxIterations: Int = 20): DataFrame = {
    val fwd = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val und = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // exact sum (no long overflow for any ids) — the monotone potential
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val nbrMin = und.join(labels.select(col("id").as("b"), col("comp").as("nbr_comp")), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nbr_comp")).as("nbr_min"))
      labels = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val curSum = labelSum(labels)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      i += 1
    }
    require(converged,
      s"connected components did not converge within $maxIterations rounds " +
        "(component diameter too large — use a star-contraction variant)")
    labels
  }
}
