package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe (dev only). */
object Probe2 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until 10).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs=${big.count()}")

    import graft.textops.Dedup
    val sh = Dedup.shingledHashed(big, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingled")(println("sh rows=" + sh.count()))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
    time("freq dist")(freq.selectExpr("min(freq)", "percentile(freq, 0.5)",
      "percentile(freq, 0.9)", "max(freq)", "count(*)").show())
    val capped = sh.join(freq.filter(col("freq") <= 1000), Seq("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("capped")(println("capped rows=" + capped.count()))
    val byDoc = Window.partitionBy("doc_id")
    val indexed = capped
      .withColumn("__pos", row_number().over(byDoc.orderBy("freq", "sh")))
      .withColumn("__n", count(lit(1)).over(byDoc))
    val prefix = indexed.filter(
      col("__pos") <= col("__n") - ceil(col("__n") * lit(0.5)) + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix index")(println("prefix rows=" + prefix.count()))
    // candidate volume BEFORE distinct
    time("prefix join raw") {
      println("raw cand rows=" + prefix.as("x").join(prefix.as("y"), Seq("sh"))
        .filter(col("x.doc_id") < col("y.doc_id")).count())
    }
    time("prefix join distinct") {
      println("cand rows=" + prefix.as("x").join(prefix.as("y"), Seq("sh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct().count())
    }
    spark.stop()
  }
}
