package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage-timing probe (dev only). */
object Probe2 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "sim"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    import graft.textops.Dedup
    mode match {
      case "sim" =>
        val df = Dedup.simhashNearPairs(docs, "doc_id", "text", maxHamming = 3)
        time("plan (analyze+optimize+physical)") { df.queryExecution.executedPlan }
        time("execute") { println(df.count()) }
      case "simNoCodegen" =>
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val df = Dedup.simhashNearPairs(docs, "doc_id", "text", maxHamming = 3)
        time("plan") { df.queryExecution.executedPlan }
        time("execute (no wholestage)") { println(df.count()) }
      case "ngram" =>
        val df = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000)
        time("plan") { df.queryExecution.executedPlan }
        time("execute") { println(df.count()) }
    }
    spark.stop()
  }
}
