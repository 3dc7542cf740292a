package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
/** Whole-suite physical-plan audit: flags the operator classes that
  * serialize or blow up at scale — unpartitioned windows (single-task
  * sort), cartesian products, and broadcast nested-loop joins. Bounded
  * instances are expected and documented in SURVEY; anything NEW in
  * this report needs a justification or a fix. */
object AuditWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        def walk(p: SparkPlan): Seq[String] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case w: WindowExec if w.partitionSpec.isEmpty =>
            Seq("GLOBALWIN") ++ w.children.flatMap(walk)
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
            Seq("CARTESIAN") ++ c.children.flatMap(walk)
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            Seq("BNLJ") ++ b.children.flatMap(walk)
          case other => other.children.flatMap(walk)
        }
        val hits = walk(plan)
        if (hits.nonEmpty)
          println(s"PLANFLAG $name :: ${hits.groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted.mkString(", ")}")
      } catch { case e: Throwable => println(s"PLANFLAG_ERR $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
