package graft.etl

import org.apache.spark.sql.SparkSession

/** Second-JVM reader for the cross-process warehouse spec — the only
  * real exercise of [[Warehouse]]'s cross-process story (the JVM-wide
  * rename locks cover one driver; a concurrent Verify run against an
  * ingest driver's warehouse root is two processes).
  *
  * Reads `<layer>/<table>` in a loop and checks each SUCCESSFUL read
  * is internally consistent under the version protocol the spec
  * writes: every row carries the table's version `v` and the table
  * holds exactly `v` rows, so a read that mixed files from two table
  * versions — or saw a half-swapped directory — is detected, not
  * lucky. The documented plain-parquet contract allows a read racing
  * a completing swap to fail LOUDLY (snapshot limitation a manifest
  * format lifts); loud failures are counted and tolerated, PARTIAL
  * reads exit 2 and fail the spec.
  *
  * stdout protocol: prints `READY` once the session is up (the spec
  * starts swapping then), `READER ok=<n> loud=<m>` at the end.
  * Exit codes: 0 = all successful reads consistent (≥1 success),
  * 2 = a mixed/partial read was observed, 3 = no read ever succeeded.
  */
object WarehouseReaderProcess {
  def main(args: Array[String]): Unit = {
    val Array(root, layer, table, itersS) = args.take(4)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = Warehouse(root)
    println("READY")
    var ok = 0
    var loud = 0
    (1 to itersS.toInt).foreach { _ =>
      try {
        val vs = wh.read(spark, layer, table)
          .select("v").collect().map(_.getLong(0))
        val distinct = vs.distinct
        if (distinct.length != 1 || vs.length != distinct.head.toInt) {
          println(s"MIXED versions=${distinct.mkString(",")} rows=${vs.length}")
          spark.stop()
          sys.exit(2)
        }
        ok += 1
      } catch { case _: Throwable => loud += 1 }
    }
    println(s"READER ok=$ok loud=$loud")
    spark.stop()
    if (ok == 0) sys.exit(3)
  }
}
