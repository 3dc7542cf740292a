package graft.analytics

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.Tables

/** Typed Dataset[T] surface — for pipelines where compile-time field
  * checks pay off (SURVEY.md §1.3 recommends typed access for control
  * tables; this demonstrates the same on a fact). The `Aggregator` is the
  * user-facing typed custom aggregate (the reference needs none — §2.11 —
  * but the engine exposes the extension point).
  */
object TypedQueries {

  final case class LineItem(l_orderkey: Long, l_quantity: Double,
                            l_extendedprice: Double, l_discount: Double,
                            l_returnflag: String)

  final case class FlagStats(flag: String, n: Long, revenue: Double)

  /** Typed revenue aggregator: IN = LineItem, BUF = (count, sum),
    * OUT = (n, revenue). Merges are associative/commutative — safe under
    * any partitioning (revenue kept as a plain double here; the exact
    * decimal path is the untyped CoreQueries.dsum). */
  val revenueAgg: Aggregator[LineItem, (Long, Double), (Long, Double)] =
    new Aggregator[LineItem, (Long, Double), (Long, Double)] {
      def zero: (Long, Double) = (0L, 0.0)
      def reduce(b: (Long, Double), a: LineItem): (Long, Double) =
        (b._1 + 1, b._2 + a.l_extendedprice * (1.0 - a.l_discount))
      def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Long, Double)): (Long, Double) = r
      def bufferEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      def outputEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    }

  /** Per-returnflag stats through the fully typed path:
    * Dataset[LineItem] → groupByKey → typed Aggregator → Dataset[FlagStats]. */
  def revenueByFlag(spark: SparkSession, dir: String): Dataset[FlagStats] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .as[LineItem]
      .groupByKey(_.l_returnflag)
      .agg(revenueAgg.toColumn.name("stats"))
      .map { case (flag, (n, rev)) => FlagStats(flag, n, rev) }
  }
}
