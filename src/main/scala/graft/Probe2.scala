package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: cold + warm timings for one SparkEntry query (TimeQ times
  * a list once; this isolates JIT/codegen warmup from steady state).
  * Usage: runMain graft.Probe2 <queryName> [sfDir] [repeats]
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q02_date_range")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until repeats).foreach { i =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name run=$i ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
