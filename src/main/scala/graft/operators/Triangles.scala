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

  /** Per-node local clustering coefficient cc(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)) over nodes with deg ≥ 2. Triangle membership
    * comes from the oriented enumeration above (each triangle emitted
    * once, then exploded to its three corners), so the per-node tally
    * is one groupBy over 3·|triangles| rows — never a neighborhood
    * self-join per node. Degrees are counted on the canonical edge
    * list; the two aggregates shuffle on the node key only.
    */
  def localClustering(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = canonical(edges, aCol, bCol)
    val deg = canon.select(col("ea").as("node"))
      .unionAll(canon.select(col("eb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val nodeTri = triangles(canon, "ea", "eb")
      .select(explode(array(col("v1"), col("v2"), col("v3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_n"))
    deg.join(nodeTri, Seq("node"), "left")
      .na.fill(0L, Seq("tri_n"))
      .filter(col("deg") >= 2)
      .select(col("node"), col("deg"), col("tri_n"),
        round((lit(2.0) * col("tri_n").cast("double")) /
          (col("deg").cast("double") * (col("deg") - 1).cast("double")), 6)
          .as("cc_r"))
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
