package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe (dev only). */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    import graft.textops.Dedup
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $n%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    println("scan partitions: " + docs.rdd.getNumPartitions)
    val sh1 = Dedup.shingledHashed(docs, "doc_id", "text", 3)
    time("shingled cold")(println(sh1.count()))
    time("shingled warm")(println(Dedup.shingledHashed(docs, "doc_id", "text", 3).count()))
    val sh2 = Dedup.shingledHashed(docs.repartition(32), "doc_id", "text", 3)
    time("shingled repart warm")(println(sh2.count()))
    time("shingled repart warm2")(println(Dedup.shingledHashed(docs.repartition(32), "doc_id", "text", 3).count()))
    spark.stop()
  }
}
