package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the FrontierQueries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001). */
class FrontierQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("p_weighted_sample emits exactly the top-50 A-Res keys, ranked") {
    val got = FrontierQueries.queries("p_weighted_sample")(spark, sf)
      .select(col("rnk"), col("key_r"), col("w_tokens"))
      .as[(Int, Double, Long)].collect()
    assert(got.length === 50)
    assert(got.map(_._1).toSeq === (1 to 50))
    // keys non-increasing in rank order; all keys are ln(u)/w <= 0
    assert(got.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
    assert(got.forall(_._2 <= 0.0))
    assert(got.forall(_._3 >= 1L))
    // determinism: a re-run selects the identical sample
    val again = FrontierQueries.queries("p_weighted_sample")(spark, sf)
      .select(col("rnk"), col("key_r"), col("w_tokens"))
      .as[(Int, Double, Long)].collect()
    assert(got.toSeq === again.toSeq)
  }

  test("t_tfidf_topterms equals the row_number-window formulation") {
    val got = FrontierQueries.queries("t_tfidf_topterms")(spark, sf)
    // rebuild with a plain window over the same scored frame
    val TF = graft.textops.TextFunctions
    val words = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(split(TF.normText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = graft.Tables.load(spark, sf, "documents").agg(count(lit(1)).as("n"))
    val scored = tf.join(dfx, "term").crossJoin(broadcast(nd))
      .withColumn("score",
        round(log(col("n").cast("double") / col("df").cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)) * col("tf"))
    val win = scored.withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"),
        col("score").cast("string").cast("double").as("score"))
    assert(got.count() === win.count())
    assert(got.exceptAll(win).isEmpty && win.exceptAll(got).isEmpty)
  }

  test("g_sssp_hubs: hubs at 0, all distances within the 3-round bound") {
    val hist = FrontierQueries.queries("g_sssp_hubs")(spark, sf)
      .select(col("dist").cast("long"), col("n_nodes"))
      .as[(Long, Long)].collect().toMap
    assert(hist.contains(0L)) // the hub layer itself
    // 3 relaxation rounds × max edge weight 8 bounds every distance
    assert(hist.keys.forall(d => d >= 0L && d <= 24L))
  }

  test("a28_cramers_v is a valid association coefficient") {
    val row = FrontierQueries.queries("a28_cramers_v")(spark, sf)
      .select(col("chi2"), col("cramers_v")).as[(Double, Double)].head()
    assert(row._1 >= 0.0)
    assert(row._2 >= 0.0 && row._2 <= 1.0)
  }
}
