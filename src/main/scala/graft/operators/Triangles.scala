package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11): direct every undirected edge from its lower
  * (degree, id) endpoint to the higher, enumerate wedges from each
  * source's out-neighborhood, and close them against the oriented edge
  * list. Each triangle appears exactly once (at its lowest-ordered
  * vertex), and wedge work is bounded by orientation out-degrees —
  * O(m^1.5) total regardless of hub degrees, the property that keeps
  * the last reducer alive on power-law graphs. Three hash joins, no
  * driver-side state.
  */
object Triangles {

  /** Normalize to distinct undirected edges as (ea < eb), self-loops
    * dropped. */
  private def canonical(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("long"); val b = col(bCol).cast("long")
    edges.select(least(a, b).as("ea"), greatest(a, b).as("eb"))
      .filter(col("ea") < col("eb"))
      .distinct()
  }

  /** Oriented edges (s → t with (deg,id)-order s < t) plus the dest
    * degree carried for wedge ordering. */
  private def oriented(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("ea").as("node"))
      .unionAll(canon.select(col("eb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("node").as("ea"), col("d").as("da")), "ea")
      .join(deg.select(col("node").as("eb"), col("d").as("db")), "eb")
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("ea") < col("eb"))
    withDeg.select(
      when(aLower, col("ea")).otherwise(col("eb")).as("s"),
      when(aLower, col("eb")).otherwise(col("ea")).as("t"),
      when(aLower, col("db")).otherwise(col("da")).as("dt"))
  }

  /** Every triangle as one (v1, v2, v3) row: v1 the wedge apex (lowest
    * in (deg,id) order), (v2, v3) its out-neighbors in that order. */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = oriented(canonical(edges, aCol, bCol))
    val x = o.select(col("s"), col("t").as("t1"), col("dt").as("dt1"))
    val y = o.select(col("s"), col("t").as("t2"), col("dt").as("dt2"))
    val wedges = x.join(y, "s").filter(
      col("dt1") < col("dt2") || (col("dt1") === col("dt2") && col("t1") < col("t2")))
    wedges.join(o.select(col("s").as("t1"), col("t").as("t2")), Seq("t1", "t2"))
      .select(col("s").as("v1"), col("t1").as("v2"), col("t2").as("v3"))
  }

  /** One-row graph summary: node / edge / triangle counts. */
  def stats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = canonical(edges, aCol, bCol)
    val nNodes = canon.select(col("ea").as("n")).unionAll(canon.select(col("eb").as("n")))
      .distinct().agg(count(lit(1)).as("n_nodes"))
    val nEdges = canon.agg(count(lit(1)).as("n_edges"))
    val nTri = triangles(edges, aCol, bCol).agg(count(lit(1)).as("n_triangles"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTri))
  }
}
