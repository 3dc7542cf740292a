package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.textops.Dedup

/** Dev harness: stress dedup operators at ~10x sf0.1 (50k docs built by
  * replicating the corpus with shifted ids — perf probe only, not a
  * correctness input). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until 10).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val cached = big.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs: ${cached.count()}")
    def time(n: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val r = b
      println(f"PROBE $n%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$r")
    }
    time("exact_dedup")(Dedup.exactDedup(cached, "doc_id", "text").count())
    time("minhash_lsh")(Dedup.minhashLsh(cached, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5).count())
    time("minhash_verified")(Dedup.minhashLshVerified(cached, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5).count())
    time("simhash")(Dedup.simhashNearPairs(cached, "doc_id", "text").count())
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(cached, "doc_id", "text",
      shingleK = 3, threshold = 0.5).count())
    spark.stop()
  }
}
