package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = try SparkEntry.queries(n)(spark, sfDir).count()
                catch { case e: Throwable => println(s"$n ERROR ${e.getMessage}"); -1L }
      println(f"TIME $n%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
