package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // 90% of fact rows share one hot key — the salting target.
  private lazy val fact = (1 to 2000).map { i =>
    (i.toLong, if (i % 10 == 0) i.toLong % 7 else 1L, i * 1.5)
  }.toDF("row_id", "k", "v")
  private lazy val dim = (0L to 7L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("salted inner join equals the plain join") {
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "v", "name")
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), saltCol = "row_id")
      .select("row_id", "k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted left join preserves unmatched probe rows") {
    val factX = fact.withColumn("k", when(col("row_id") <= 5, lit(99L)).otherwise(col("k")))
    val plain = factX.join(dim, Seq("k"), "left").select("row_id", "name")
    val salted = SkewJoin.saltedJoin(factX, dim, Seq("k"), "row_id", joinType = "left")
      .select("row_id", "name")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.filter(col("name").isNull).count() === 5)
  }

  test("hot key actually scatters across salt buckets") {
    val salts = fact.filter(col("k") === 1L)
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }
}
