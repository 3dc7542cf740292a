package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: all pairs (a, b) with
  * `a.start <= b.end AND b.start <= a.end` (closed intervals).
  *
  * The naive form is an inequality join — a broadcast nested loop or a
  * cartesian at scale. Here each interval explodes into the fixed-width
  * BUCKETS it spans, candidates co-locate per bucket (one hash shuffle
  * per side, like any equi-join), and the exact predicate filters the
  * per-bucket candidates. A pair spanning several shared buckets would
  * duplicate, so each pair is CREDITED to exactly one owner — the bucket
  * containing `greatest(a.start, b.start)`, which every overlapping pair
  * has and only one bucket owns — making the output exact with NO
  * distinct pass.
  *
  * `bucketW` tunes the shuffle: ≈ the typical interval length is right
  * (shorter → more replicas per interval; longer → more candidates per
  * bucket). Intervals much longer than `bucketW` replicate
  * `len/bucketW`-fold — bound interval length or raise the width, the
  * standard spatial-join discipline.
  */
object IntervalJoin {

  /** Overlap pairs of `a` × `b`. Both sides need `idCol`, `startCol`,
    * `endCol` (numeric, start <= end). Output: a_id, b_id, plus the
    * intersection bounds ov_start / ov_end. */
  def overlap(a: DataFrame, b: DataFrame, idCol: String,
              startCol: String, endCol: String, bucketW: Long): DataFrame = {
    require(bucketW > 0, "overlap: bucketW must be positive")
    def explodeSide(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol).as(s"${tag}_id"),
          col(startCol).as(s"${tag}_start"), col(endCol).as(s"${tag}_end"))
        .withColumn("__bucket", explode(sequence(
          floor(col(s"${tag}_start") / bucketW).cast("long"),
          floor(col(s"${tag}_end") / bucketW).cast("long"))))
    val ea = explodeSide(a, "a")
    val eb = explodeSide(b, "b")
    val owner = floor(greatest(col("a_start"), col("b_start")) / bucketW).cast("long")
    ea.join(eb, "__bucket")
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .filter(col("__bucket") === owner)
      .select(col("a_id"), col("b_id"),
        greatest(col("a_start"), col("b_start")).as("ov_start"),
        least(col("a_end"), col("b_end")).as("ov_end"))
  }
}
