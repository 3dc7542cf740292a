package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
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
            Seq(w.windowExpression.map(_.sql).mkString(";").take(60)) ++ w.children.flatMap(walk)
          case other => other.children.flatMap(walk)
        }
        val hits = walk(plan)
        if (hits.nonEmpty) println(s"GLOBALWIN $name :: ${hits.size}")
      } catch { case e: Throwable => println(s"GLOBALWIN_ERR $name ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
