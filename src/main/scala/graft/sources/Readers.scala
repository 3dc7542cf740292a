package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced source readers (SURVEY.md §1.1: the engine never
  * infers schemas — every ingest declares its contract, so a drifting
  * upstream file fails loudly at read time instead of silently changing
  * column types downstream).
  *
  * CSV follows the bronze BULK INSERT contract (header row skipped,
  * comma-delimited, permissive — malformed rows become nulls for the DQ
  * checks to count rather than killing a 100 TB load).
  */
object Readers {

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Opaque media ingestion: every file under `path` (optionally
    * glob-filtered) becomes one row of (path, modificationTime, length,
    * content BINARY) — the raw-bytes source for the multimodal pipeline
    * (`graft.textops.Multimodal`); pair with
    * `spark.sql.files.maxPartitionBytes` so many small media files pack
    * into few tasks. */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Read parquet and verify it matches the declared contract (names +
    * types, nullability ignored) — the catalog-drift guard. */
  def parquetChecked(spark: SparkSession, path: String,
                     expected: StructType): DataFrame = {
    val df = spark.read.parquet(path)
    val got = df.schema.map(f => (f.name, f.dataType.simpleString))
    val want = expected.map(f => (f.name, f.dataType.simpleString))
    require(got == want,
      s"schema drift at $path:\n  got  $got\n  want $want")
    df
  }
}
