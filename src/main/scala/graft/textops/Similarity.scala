package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: one narrow scan, a per-row
  *    codegen'd dot product, and a k-row ordered take. The baseline and
  *    the verifier for the approximate path.
  *  - [[lshTopK]] — the scale path: seeded random-hyperplane buckets
  *    restrict the scan to candidates sharing ≥1 band with the query, so
  *    cost tracks bucket occupancy instead of corpus size. Recall is
  *    tunable via planes/bands.
  *
  * Vector math is `zip_with`/`aggregate` over doubles — sequential
  * per-row folds, so scores are bit-deterministic regardless of
  * partitioning.
  */
object Similarity {

  /** Cosine similarity between two numeric-array columns, computed in
    * double via composable built-ins. Zero vectors yield NULL (guarded
    * denominators). For `array<float>` inputs prefer [[cosineNative]] —
    * same accumulation order, bit-identical results, fused codegen loop. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / nullif(na * nb, lit(0.0))
  }

  /** Native codegen cosine for float vectors (graft.functions.FloatVecCosine). */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vec_cosine(a, b)

  /** Deterministic pseudo-random hyperplanes (fixed seed) as literal
    * arrays — identical on every executor and every run. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def planeLit(p: Array[Double]): Column = array(p.map(lit): _*)

  private def dotPlane(vec: Column, p: Array[Double]): Column =
    aggregate(zip_with(vec, planeLit(p), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-bit bucket signature: bit i = (vec · plane_i) >= 0. */
  def bucketSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotPlane(vec, p) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Exact cosine top-k against a literal query vector. The scan side is
    * `array<float>`; the query literal is cast to float (lossless when it
    * originated from a float embedding), so the whole scoring scan runs
    * through the fused native loop. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*).cast("array<float>")
    df.select(col(idCol), cosineNative(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed top-k: candidates = rows sharing at least one band of
    * `planesPerBand` sign bits with the query; exact cosine ranks them.
    * With `bands` bands the probability a true neighbor shares none decays
    * as (1 − s^planesPerBand)^bands. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, dim: Int,
              bands: Int = 4, planesPerBand: Int = 6,
              seed: Long = 42L): DataFrame = {
    val bandPlanes: Seq[Seq[Array[Double]]] =
      (0 until bands).map(b => hyperplanes(dim, planesPerBand, seed + b))
    val qSig: Seq[Long] = bandPlanes.map(planes =>
      planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(query).map { case (w, x) => w * x }.sum
        if (d >= 0) 1L << i else 0L
      }.reduce(_ | _))
    val candidateCond = bandPlanes.zip(qSig).map { case (planes, sig) =>
      bucketSignature(col(vecCol), planes) === lit(sig)
    }.reduce(_ || _)
    df.filter(candidateCond)
      .select(col(idCol),
        cosineNative(col(vecCol),
          array(query.map(lit): _*).cast("array<float>")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
