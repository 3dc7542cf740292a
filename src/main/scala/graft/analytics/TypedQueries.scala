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

  /** Narrow input for the exact typed aggregation — deserializing only
    * the three fields the Aggregator reads (object creation dominates
    * the typed path's cost; column pruning still pushes to the scan). */
  final case class RevRow(l_extendedprice: Double, l_discount: Double,
                          l_returnflag: String)

  /** The ORACLE-GRADE twin of [[revenueAgg]]: the buffer carries an
    * exact java BigDecimal, so merge order (partitioning, AQE splits)
    * can never perturb the sum — the typed-path analog of the untyped
    * DECIMAL(18,4) routing every oracled entry uses. Inputs are scaled
    * to 4 dp first (BigDecimal.valueOf keeps the double's shortest
    * decimal rendering; setScale(4) pins it to what SQL's CAST(… AS
    * DECIMAL(18,4)) produces). */
  val exactRevenueAgg: Aggregator[RevRow, (Long, java.math.BigDecimal),
                                  (Long, java.math.BigDecimal)] =
    new Aggregator[RevRow, (Long, java.math.BigDecimal),
                   (Long, java.math.BigDecimal)] {
      private def d4(x: Double): java.math.BigDecimal =
        java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP)
      def zero: (Long, java.math.BigDecimal) = (0L, java.math.BigDecimal.ZERO)
      def reduce(b: (Long, java.math.BigDecimal), a: RevRow) =
        (b._1 + 1, b._2.add(
          d4(a.l_extendedprice).multiply(
            java.math.BigDecimal.ONE.subtract(d4(a.l_discount)))))
      def merge(x: (Long, java.math.BigDecimal),
                y: (Long, java.math.BigDecimal)) =
        (x._1 + y._1, x._2.add(y._2))
      def finish(r: (Long, java.math.BigDecimal)) = r
      def bufferEncoder: Encoder[(Long, java.math.BigDecimal)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.DECIMAL)
      def outputEncoder: Encoder[(Long, java.math.BigDecimal)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.DECIMAL)
    }

  final case class FlagRevenue(flag: String, n_items: Long, revenue: Double)

  /** Typed pipeline returning engine-exact revenue per flag — the
    * entry behind `typed_agg_revenue`. */
  def exactRevenueByFlag(spark: SparkSession, dir: String): Dataset[FlagRevenue] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .select("l_extendedprice", "l_discount", "l_returnflag")
      .as[RevRow]
      .groupByKey(_.l_returnflag)
      .agg(exactRevenueAgg.toColumn.name("stats"))
      .map { case (flag, (n, rev)) => FlagRevenue(flag, n, rev.doubleValue) }
  }
}
