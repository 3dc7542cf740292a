package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q12_part_to_whole_region", "q05_magnitude_by_part_type",
               "i_watermark_delta", "q13_report_customers")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"========== $n ==========")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.filter(l =>
          l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Broadcast") ||
          l.contains("Exchange") || l.contains("WholeStageCodegen") ||
          l.matches("^\\(\\d+\\) .*")).mkString("\n"))
    }
    spark.stop()
  }
}
