package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Writes the FULL `.explain("formatted")` output of the named declared
  * queries to `<outDir>/<name>_<tag>.txt` — the optimization rounds'
  * evidence files (plans/r15/...). Usage:
  *   PlanDump <names,csv> <sfDir> <outDir> <tag>
  * Uses the same session shape as Bench (local[32], shuffle
  * partitions = cpus, AQE on) so the captured plan is the plan the
  * bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val tag = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      println(s"wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
