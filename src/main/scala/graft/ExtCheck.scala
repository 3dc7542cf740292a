package graft

import org.apache.spark.sql.SparkSession

/** Dev check: a FRESH session configured only via
  * `spark.sql.extensions=graft.GraftExtensions` must expose vec_cosine
  * in SQL and rewrite levenshtein filters — proving the spark-sql / JDBC
  * entry path works without any programmatic registration. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cos = spark.sql(
      """SELECT vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12, s"vec_cosine broken: $cos")
    println(s"EXTCHECK vec_cosine OK ($cos)")

    val h = spark.sql("SELECT md5_long('hello world') AS h").head().getLong(0)
    // first 16 hex of md5('hello world') = 5eb63bbbe01eeed0, signed
    assert(h == java.lang.Long.parseUnsignedLong("5eb63bbbe01eeed0", 16),
      s"md5_long broken: $h")
    println(s"EXTCHECK md5_long OK ($h)")

    val z = spark.sql("SELECT zorder_key(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z")
      .head().getLong(0)
    // x=3 (0b11) even bits, y=5 (0b101) odd bits: 0b100111 = 39
    assert(z == 39L, s"zorder_key broken: $z")
    println(s"EXTCHECK zorder_key OK ($z)")

    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    import spark.implicits._
    Seq(("ab", "abc"), ("kitten", "sitting")).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter("levenshtein(a, b) <= 2")
      .queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("abs("),
      s"LevenshteinPrefilter not active via extensions:\n$plan")
    println("EXTCHECK LevenshteinPrefilter OK")

    val jwPlan = spark.read.parquet(dir)
      .filter("jaro_winkler(a, b) >= 0.95")
      .queryExecution.optimizedPlan.toString
    assert(jwPlan.toLowerCase.contains("least("),
      s"JaroWinklerPrefilter not active via extensions:\n$jwPlan")
    val jwVal = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s")
      .head().getDouble(0)
    assert(math.abs(jwVal - 0.9611111111111111) < 1e-12,
      s"jaro_winkler broken: $jwVal")
    println("EXTCHECK JaroWinklerPrefilter OK")
    spark.stop()
  }
}
