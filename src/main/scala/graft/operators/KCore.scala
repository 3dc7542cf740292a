package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous k-core peeling: each round removes EVERY
  * node whose current degree is below k, simultaneously — the
  * Pregel-style formulation whose state after exactly R rounds is
  * well-defined on any engine (no tie-order dependence), which is what
  * lets a SQL oracle replay it as R chained CTEs.
  *
  * Each round is one degree aggregation + two semi joins, all hash-
  * partitioned on the node key; lineage is cut per round with an eager
  * localCheckpoint (the ConnectedComponents discipline — without it the
  * replayed plan doubles per round). At 100 TB: degree tables are
  * node-sized, edge filters edge-sized, nothing driver-bound.
  */
object KCore {

  /** Surviving (node, degree) pairs after `rounds` synchronous peels of
    * the undirected graph at threshold `k`. Input edges are
    * symmetrized + deduplicated here; self-loops are dropped. */
  def survivors(edges: DataFrame, aCol: String, bCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got k=$k rounds=$rounds")
    val fwd = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    var und = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    (0 until rounds).foreach { _ =>
      val keep = und.groupBy(col("a")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= k).select(col("a").as("kn"))
      und = und
        .join(keep, col("a") === col("kn"), "left_semi")
        .join(keep.select(col("kn").as("kb")), col("b") === col("kb"),
              "left_semi")
        .localCheckpoint(true)
    }
    und.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
  }
}
