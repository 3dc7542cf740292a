package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions
import graft.functions.StrSim

/** The Jaro-Winkler prefilter must inject the length-ratio guard in
  * front of `jw >= τ` predicates (plain and round-6 forms) without
  * changing results — including on real part-name data — be vacuous at
  * τ ≤ 0.8, and be idempotent. */
class JaroWinklerPrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // parquet-backed so the filter survives to the optimizer
  private lazy val names = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jw").toString
    Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("same", "same"), ("x", "xxxxxxxxxx"), ("abcd", "abce"),
      ("goldenrod lavender", "goldenrod lavendar")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaroWinklerPrefilter
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == JaroWinklerPrefilter)
  }

  test("guard appears for raw and round-6 predicates, results unchanged") {
    val base1 = names.filter(StrSim.jaro_winkler(col("a"), col("b")) >= 0.95)
      .collect().toSet
    val base2 = names
      .filter(round(StrSim.jaro_winkler(col("a"), col("b")), 6) >= 0.95)
      .collect().toSet
    withRule {
      val q1 = names.filter(StrSim.jaro_winkler(col("a"), col("b")) >= 0.95)
      val opt1 = q1.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt1.contains("least(") && opt1.contains("greatest("),
        s"ratio guard not injected:\n$opt1")
      assert(q1.collect().toSet === base1)

      val q2 = names
        .filter(round(StrSim.jaro_winkler(col("a"), col("b")), 6) >= 0.95)
      val opt2 = q2.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt2.contains("least("), s"round-form guard missing:\n$opt2")
      assert(q2.collect().toSet === base2)
    }
  }

  test("vacuous below 0.8 threshold — no guard injected") {
    withRule {
      val q = names.filter(StrSim.jaro_winkler(col("a"), col("b")) >= 0.7)
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(!opt.contains("least("), s"guard should be absent:\n$opt")
    }
  }

  test("idempotent when the guard is already present") {
    withRule {
      val q = names.filter(
        least(length(col("a")), length(col("b"))).cast("double") >=
          lit(0.749999) * greatest(length(col("a")), length(col("b")))
            .cast("double") &&
        StrSim.jaro_winkler(col("a"), col("b")) >= 0.95)
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      val guards = "least\\(".r.findAllIn(opt).length
      assert(guards === 1, s"expected 1 guard, plan:\n$opt")
    }
  }

  test("guard never drops a qualifying pair on real part names") {
    val parts = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_partkey"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("w1"))
    val a = parts.select(col("w1"), col("p_partkey").as("ka"),
                         col("p_name").as("na"))
    val b = parts.select(col("w1"), col("p_partkey").as("kb"),
                         col("p_name").as("nb"))
    val joined = a.join(b, "w1").filter(col("ka") < col("kb"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ka").cast("long"), col("kb").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = pairs(joined
      .filter(round(StrSim.jaro_winkler(col("na"), col("nb")), 6) >= 0.92))
    val guarded = pairs(joined
      .filter(least(length(col("na")), length(col("nb"))).cast("double") >=
        lit(5.0 * 0.92 - 4.0 - 1e-6) *
          greatest(length(col("na")), length(col("nb"))).cast("double"))
      .filter(round(StrSim.jaro_winkler(col("na"), col("nb")), 6) >= 0.92))
    assert(guarded === unguarded,
      s"guard dropped ${(unguarded -- guarded).size} qualifying pairs")
  }
}
