package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the verified-minhash pipeline. Dev tool. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    (0 until 2).foreach { round =>
      println(s"== round $round")
      val sh = graft.textops.Dedup.shingledHashed(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("shingle+distinct") { sh.count() }
      val sigs = timed("minhash32 plan+exec") {
        val mins = sh.groupBy("doc_id")
          .agg(min(xxhash64(col("sh"), lit(0))).as("h0"),
               (1 until 32).map(i =>
                 min(xxhash64(col("sh"), lit(i))).as(s"h$i")): _*)
        val s2 = mins.select(col("doc_id"),
          array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s2.count(); s2
      }
      val sets = timed("sets build") {
        val st = sh.groupBy("doc_id")
          .agg(collect_list(col("sh")).as("set"), count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        st.count(); st
      }
      timed("band+join+verify") {
        val rowsPerBand = 2
        val key = posexplode(array((0 until 16).map { b =>
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("array<string>")), lit(b))
        }: _*)).as(Seq("band", "band_hash"))
        val keys = sigs.select(col("doc_id"), key)
        val a = keys.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
        val b = keys.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
        val cands = a.join(b, Seq("band", "band_hash"))
          .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
        cands
          .join(broadcast(sets).select(col("doc_id").as("id_a"),
            col("set").as("set_a"), col("n").as("n_a")), "id_a")
          .join(broadcast(sets).select(col("doc_id").as("id_b"),
            col("set").as("set_b"), col("n").as("n_b")), "id_b")
          .withColumn("__i", size(array_intersect(col("set_a"), col("set_b"))))
          .filter(col("__i").cast("double")
            / (col("n_a") + col("n_b") - col("__i")).cast("double") >= 0.5)
          .count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
