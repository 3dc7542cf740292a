package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every left row, attach the single most recent
  * right row with `right.time <= left.time` in the same key group (the
  * time-series "latest state as of" operator — DuckDB/kdb ASOF JOIN,
  * Flink temporal join; Spark has no built-in equivalent).
  *
  * Implementation is the scalable union-and-sweep form, not a range
  * join: tag both inputs, union, and run one `last(payload IGNORE
  * NULLS)` over a (key-partitioned, time-ordered) window. That is ONE
  * shuffle on the key and a per-partition sort — O(n log n) per key
  * group — where a per-row inequality join explodes quadratically in
  * group size and a broadcast range join caps at driver memory. At
  * 100 TB both sides stream through the same exchange; skewed keys
  * AQE-split like any window shuffle.
  *
  * Right rows at exactly the left row's timestamp ARE visible
  * (inclusive as-of, matching DuckDB's `ON l.t >= r.t`); among
  * right-side timestamp ties the largest payload struct wins
  * (field-order comparison — deterministic under any partitioning).
  */
object AsOfJoin {

  /** `right`'s non-(key,time) columns become the attached payload; they
    * must not collide with `left`'s column names. Unmatched left rows
    * keep null payloads (left as-of join). NULL-timestamp right rows
    * never match (SQL comparison semantics: `l.t >= NULL` is unknown),
    * and NULL-timestamp left rows match nothing — same as DuckDB ASOF. */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == time).toSeq
    require(payloadCols.nonEmpty, "right side must carry payload columns")
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val reserved = Seq("__p", "__side", "__m")
    require(reserved.intersect(left.columns.toSeq ++ right.columns.toSeq).isEmpty,
      s"column names ${reserved.mkString(",")} are reserved by asOf")

    val r2 = right.filter(col(time).isNotNull)
      .select(col(key), col(time),
        struct(payloadCols.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val payloadType = r2.schema("__p").dataType
    val l2 = left
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val leftOther = left.columns.filterNot(c => c == key || c == time)
    val r3 = leftOther.foldLeft(r2) { (d, c) =>
      d.withColumn(c, lit(null).cast(l2.schema(c).dataType))
    }
    val cols = (left.columns :+ "__p" :+ "__side").map(col(_))
    val u = l2.select(cols: _*).unionByName(r3.select(cols: _*))

    // side 0 < 1 ⇒ right rows at an equal timestamp sort before the left
    // row and land inside its frame (inclusive as-of); __p ordering only
    // breaks right-vs-right timestamp ties.
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc, col("__p").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col(_)) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
