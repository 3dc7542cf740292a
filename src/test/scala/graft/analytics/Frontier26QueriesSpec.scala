package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier26Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier26QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sql_recursive_cte walks the decimal trie to closure") {
    val got = Frontier26Queries.queries("sql_recursive_cte")(spark, sf)
      .select(col("depth"), col("n_nodes"), col("key_checksum"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty && got.head._1 === 0)
    // driver-side closure rebuild
    val keys = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey")).as[Long].collect().toSet
    var frontier = keys.filter(_ < 10)
    var depth = 0
    val exp = scala.collection.mutable.ListBuffer.empty[(Int, Long, Long)]
    while (frontier.nonEmpty) {
      exp += ((depth, frontier.size.toLong, frontier.sum))
      frontier = keys.filter(k => k >= 10 && frontier.contains(k / 10))
      depth += 1
    }
    assert(got.toSeq === exp.toList, s"got ${got.toSeq} exp $exp")
    // every supplier reachable from a sub-10 root appears exactly once
    assert(got.map(_._2).sum <= keys.size.toLong)
  }

  test("s27_skew_report quantifies the salting fix") {
    val got = Frontier26Queries.queries("s27_skew_report")(spark, sf)
      .select(col("strategy"), col("occupied"), col("largest_bucket"),
        col("total_rows"), col("skew_factor_r"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("plain", "salted"))
    val (p, sRow) = (got("plain"), got("salted"))
    // same data volume through both strategies
    assert(p._4 === sRow._4)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(p._4 === total)
    // the story: a 3-value key occupies <= 3 of 32 buckets; salting
    // with 8 salts occupies more buckets and shrinks the largest
    assert(p._2 <= 3)
    assert(sRow._2 > p._2)
    assert(sRow._3 < p._3, "salting shrinks the largest bucket")
    assert(sRow._5 < p._5, "salting reduces the skew factor")
    assert(p._5 > 5.0, "unsalted 3-of-32 occupancy is heavily skewed")
  }

  test("t_langid_eval confusion counts reconcile with the corpus") {
    val got = Frontier26Queries.queries("t_langid_eval")(spark, sf)
      .select(col("lang"), col("pred"), col("n"),
        col("class_accuracy_r"))
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(got.map(_._3).sum === totalDocs)
    // per-class accuracy equals the diagonal share within the class
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val nt = rows.map(_._3).sum
      val nc = rows.filter(r => r._2 == lang).map(_._3).sum
      val acc = rows.head._4
      assert(math.abs(acc - nc.toDouble / nt) < 1e-6, s"$lang")
      rows.foreach(r => assert(math.abs(r._4 - acc) < 1e-9,
        s"$lang accuracy constant across its rows"))
    }
  }
}
