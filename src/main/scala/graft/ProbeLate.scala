package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Scratch probe for the st_late_drop staging: how many micro-batches
  * does the file source plan, and what does each drop? */
object ProbeLate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val lateDayUs = 19724L * 86400000000L
    val splitUs = 19737L * 86400000000L
    val e = Tables.load(spark, dir, "events")
    val day2 = col("ts").geq(lateDayUs * 1000) &&
      col("ts") < (lateDayUs + 86400000000L) * 1000
    val a = e.filter(col("ts") < splitUs * 1000 && !day2)
    val b = e.filter(col("ts") >= splitUs * 1000 || day2)
    println(s"A=${a.count()} B=${b.count()}")
    val root = java.nio.file.Files.createTempDirectory("graft_latep")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = root.resolve(name + "_stage")
      df.coalesce(1).write.parquet(tmp.toString)
      val s = java.nio.file.Files.list(tmp)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.move(p, root.resolve(name))
        }
      } finally s.close()
      java.nio.file.Files.setLastModifiedTime(root.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeOne(a, "a.parquet", now - 600000)
    writeOne(b, "b.parquet", now)
    val ev = graft.streaming.EventStream.readEvents(spark, root.toString,
        maxFilesPerTrigger = 1)
      .withWatermark("event_time", "10 minutes")
    val agg = ev.groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 4))).cast("double").as("tv"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_probe")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"dropped=${Option(p.stateOperators).map(_.toSeq.map(_.numRowsDroppedByWatermark).sum)}")
    }
    q.explain()
    q.stop()
    println("result rows: " + spark.table("late_probe").count())
    println("day2 rows in result: " + spark.table("late_probe")
      .filter(col("window.start") < to_timestamp(lit("2024-01-03")) &&
              col("window.start") >= to_timestamp(lit("2024-01-02")))
      .count())
    spark.stop()
  }
}
