package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing of the ngram-Jaccard pipeline at a given sf —
  * identifies which phase (shingle+distinct, freq join, window prefix,
  * bucket self-join, verify) owns the wall-clock. Dev tool. */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    (0 until 2).foreach { round =>
      println(s"== round $round")
      val sh = graft.textops.Dedup.shingledHashed(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("shingle+distinct+persist") { sh.count() }
      val freq = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
      val capped = sh.join(freq.filter(col("freq") <= 1000), Seq("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("freq+cap join+persist") { capped.count() }
      val byDoc = Window.partitionBy("doc_id")
      val indexed = capped
        .withColumn("__pos", row_number().over(byDoc.orderBy("freq", "sh")))
        .withColumn("__n", count(lit(1)).over(byDoc))
      val prefix = indexed.filter(
        col("__pos") <= col("__n") - ceil(col("__n") * lit(0.5) - lit(1e-9)) + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("window+prefix+persist") { prefix.count() }
      val alpha = ceil(
        (col("x.__n") + col("y.__n")) * lit(0.5 / 1.5) - lit(1e-9))
      val cands = prefix.as("x").join(prefix.as("y"), Seq("sh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .filter(least(col("x.__n") - col("x.__pos"), col("y.__n") - col("y.__pos")) + 1 >= alpha)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      timed("bucket self-join count") { println("  cands=" + cands.count()) }
      val sets = capped.select("doc_id", "sh").groupBy("doc_id")
        .agg(collect_list(col("sh")).as("set"), count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("sets build") { sets.count() }
      val out = cands
        .join(broadcast(sets).select(col("doc_id").as("id_a"), col("set").as("set_a"),
          col("n").as("n_a")), "id_a")
        .join(broadcast(sets).select(col("doc_id").as("id_b"), col("set").as("set_b"),
          col("n").as("n_b")), "id_b")
        .withColumn("__i", size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard", col("__i").cast("double")
          / (col("n_a") + col("n_b") - col("__i")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard").distinct()
      timed("verify") { println("  pairs=" + out.count()) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
