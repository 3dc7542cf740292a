package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job time attribution for a declared query: runs the named
  * entries once (construction + count) with a listener that prints each
  * Spark job's duration, description and call site — the local-mode
  * stand-in for the UI's Jobs page (guide §7.1). Dev-only. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val sites = js.stageInfos.map(_.name.takeWhile(_ != '<'))
          .filterNot(_.contains("CompletableFuture")).distinct
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(if (sites.nonEmpty) sites.mkString(" | ") else "?")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val dt = (je.time - t0) / 1000.0
          if (dt >= 0.05)
            println(f"JOB ${je.jobId}%4d ${dt}%7.2f s  $desc")
        }
      }
    })
    names.foreach { n =>
      println(s"===== $n =====")
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"TOTAL $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
