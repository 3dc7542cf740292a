package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the package-private `Dataset.ofRows`, so library
  * code can materialize a DataFrame from a custom LogicalPlan (the
  * supported extension surface covers injecting rules/strategies, but
  * CONSTRUCTING a plan node still needs this hop). Kept to one line of
  * privileged access — everything else lives in graft.plans.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (the classic converter is
    * package-private in 4.x's unified-Column world). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
