package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** AsOfJoin semantics: inclusive as-of matching, null for no-prior-row,
  * tie-breaking, and partitioning invariance. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "l_a"),  // key 1, t=10
    (1L, 20L, "l_b"),
    (1L, 5L,  "l_c"),  // before any right row
    (2L, 50L, "l_d"),  // key 2: right rows exist only for key 1
    (3L, 7L,  "l_e")   // key 3: right row at exactly t=7 (inclusive)
  ).toDF("k", "t", "lv")

  private lazy val right = Seq(
    (1L, 8L,  "r_8"),
    (1L, 10L, "r_10"), // exactly at l_a's time → visible to l_a
    (1L, 15L, "r_15"),
    (3L, 7L,  "r_7")
  ).toDF("k", "t", "rv")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame): Map[String, String] =
    AsOfJoin.asOf(l, r, key = "k", time = "t")
      .select(col("lv"), coalesce(col("rv"), lit("none")).as("rv"))
      .as[(String, String)].collect().toMap

  test("picks the most recent right row at or before each left time") {
    val got = run(left, right)
    assert(got === Map(
      "l_a" -> "r_10",  // equal timestamp is visible (inclusive)
      "l_b" -> "r_15",
      "l_c" -> "none",  // no right row at or before t=5
      "l_d" -> "none",  // key with no right rows at all
      "l_e" -> "r_7"))
  }

  test("result is invariant under input partitioning") {
    val a = run(left, right)
    val b = run(left.repartition(13), right.repartition(7))
    assert(a === b)
  }

  test("right-side timestamp ties resolve deterministically (max payload)") {
    val r2 = right.union(Seq((1L, 15L, "r_15b")).toDF("k", "t", "rv"))
    val got = run(left, r2)
    assert(got("l_b") === "r_15b") // struct-max of the tied rows
  }

  test("payload column collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumnRenamed("rv", "lv"), "k", "t")
    }
  }

  test("reserved internal column names are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumn("__side", lit(1)), right, "k", "t")
    }
  }

  test("null timestamps never match (SQL comparison semantics)") {
    val lNull = left.union(Seq((1L, Option.empty[Long], "l_null"))
      .toDF("k", "t", "lv"))
    val rNull = right.union(Seq((1L, Option.empty[Long], "r_null"))
      .toDF("k", "t", "rv"))
    val got = run(lNull, rNull)
    assert(got("l_null") === "none")  // null left time matches nothing
    assert(got("l_b") === "r_15")     // null right row invisible to everyone
    assert(!got.values.toSet.contains("r_null"))
  }
}
