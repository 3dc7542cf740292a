package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lloyd's k-means over a long-layout (vec_id, dim, value) point set,
  * shared by the `ml_kmeans_embed` entry and the cluster-quality
  * diagnostics built on top of it.
  *
  * Scale shape: assignment is one join on the dim key against the
  * k·dim-row broadcast centroid table + a groupBy(vec, cluster) for
  * distances + a partitioned argmin window; the update is one
  * groupBy(cluster, dim) mean. Determinism: coordinates freeze to
  * round-6 DECIMAL on load, squared distances are exact decimals
  * (diffs clamped to DECIMAL(12,6)), argmin ties break on cid, seeds
  * are the k smallest md5(vec_id) via the two-phase TopK operator,
  * and centroid means re-freeze to round-6 DECIMAL each round.
  */
object KMeans {

  /** Explode an embedding table to exact long layout (vec_id, dim, vd). */
  def pointsLong(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding"))
        .as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        round(col("v").cast("double"), 6).cast(DecimalType(18, 6)).as("vd"))

  /** Hash-seeded initial centroids: the k smallest md5("km:"+vec_id). */
  def seedCentroids(emb: DataFrame, pts: DataFrame, k: Int): DataFrame = {
    val seeds = graft.operators.TopK.rankTopK(
        emb.select(col("vec_id"),
          md5(concat(lit("km:"), col("vec_id").cast("string"))).as("h")),
        k, Seq(col("h").asc, col("vec_id").asc), "cid")
      .select(col("vec_id"), col("cid").cast("int").as("cid"))
    pts.join(broadcast(seeds), "vec_id")
      .select(col("cid"), col("dim"), col("vd").as("cd"))
  }

  /** Exact-decimal assignment: (vec_id, cid, d2) with argmin ties on cid. */
  def assign(pts: DataFrame, cent: DataFrame): DataFrame = {
    val sq = (col("vd") - col("cd")).cast(DecimalType(12, 6))
    pts.join(broadcast(cent), "dim")
      .withColumn("sq", sq * sq)
      .groupBy("vec_id", "cid").agg(sum(col("sq")).as("d2"))
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("d2"))
  }

  /** `iters` Lloyd rounds from the hash seeds; returns the final
    * centroid table (cid, dim, cd). */
  def fit(emb: DataFrame, pts: DataFrame, k: Int, iters: Int): DataFrame = {
    var cent = seedCentroids(emb, pts, k).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val asg = assign(pts, cent)
      cent = pts.join(asg.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(round(sum(col("vd")).cast("double") / count(lit(1)), 6)
          .cast(DecimalType(18, 6)).as("cd"))
        .localCheckpoint(true)
    }
    cent
  }

  /** DuckDB CTE chain mirroring [[pointsLong]]+[[fit]]+[[assign]]:
    * produces CTEs `pts`, final centroids `c$iters`, and the final
    * assignment `a${iters+1}`. Prepend inside a WITH list. */
  def sqlCtes(dim: Int, k: Int, iters: Int): String = {
    def distAssign(centCte: String, n: Int) =
      s"""dd$n AS (SELECT p.vec_id, c.cid,
         |    SUM(CAST(p.vd - c.cd AS DECIMAL(12,6))
         |      * CAST(p.vd - c.cd AS DECIMAL(12,6))) AS d2
         |  FROM pts p JOIN $centCte c USING (dim) GROUP BY 1, 2),
         |a$n AS (SELECT vec_id, cid, d2 FROM dd$n
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY d2, cid) = 1)""".stripMargin
    def update(n: Int) =
      s"""c$n AS (SELECT a.cid, p.dim,
         |    CAST(round(CAST(CAST(SUM(p.vd) AS VARCHAR) AS DOUBLE)
         |      / COUNT(*), 6) AS DECIMAL(18,6)) AS cd
         |  FROM pts p JOIN a$n a USING (vec_id) GROUP BY 1, 2)""".stripMargin
    val rounds = (1 to iters).map(n =>
      s"${distAssign(s"c${n - 1}", n)},\n${update(n)}").mkString(",\n")
    s"""pts AS (SELECT vec_id, r.i AS dim,
       |    CAST(round(CAST(embedding[r.i + 1] AS DOUBLE), 6)
       |      AS DECIMAL(18,6)) AS vd
       |  FROM embeddings CROSS JOIN range(0, $dim) r(i)),
       |sd AS (SELECT vec_id, CAST(row_number() OVER (
       |    ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id) AS INT)
       |    AS cid
       |  FROM embeddings QUALIFY cid <= $k),
       |c0 AS (SELECT sd.cid, p.dim, p.vd AS cd
       |       FROM pts p JOIN sd USING (vec_id)),
       |$rounds,
       |${distAssign(s"c$iters", iters + 1)}""".stripMargin
  }
}
