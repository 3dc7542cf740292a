package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: split d_dup_clusters cost into (a) the verified-minhash
  * pair pipeline and (b) the connected-components loop over the
  * materialized pairs. Usage: runMain graft.ProbeCc [sfDir]
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    (0 until 2).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = textops.Dedup.minhashLshVerified(docs, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .persist()
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val cc = operators.ConnectedComponents.components(pairs, "id_a", "id_b")
      val nCc = cc.count()
      val t2 = System.nanoTime()
      val cc2 = operators.ConnectedComponents
        .componentsStarContraction(pairs, "id_a", "id_b")
      val nCc2 = cc2.count()
      val t3 = System.nanoTime()
      println(f"PROBECC run=$i pairs=${(t1 - t0) / 1e9}%6.2f s (n=$nPairs) " +
        f"prop=${(t2 - t1) / 1e9}%6.2f s (n=$nCc) star=${(t3 - t2) / 1e9}%6.2f s (n=$nCc2)")
      pairs.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
