package graft
import org.apache.spark.sql.SparkSession
object QcMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = graft.etl.Warehouse("/tmp/wh_ref")
    graft.etl.QualityChecks.runAll(spark, wh).toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(f"QC $k%-24s $v") }
    spark.stop()
  }
}
