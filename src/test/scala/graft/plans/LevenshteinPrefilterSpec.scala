package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** The optimizer rule must inject the length-band guard in front of
  * levenshtein threshold predicates without changing results, and must
  * be idempotent. */
class LevenshteinPrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation can't fold the filter away
  // before the rule is observable
  private lazy val names = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq(
      ("ab", "abc"), ("kitten", "sitting"), ("abcdefgh", "a"),
      ("same", "same"), ("close", "clove"), ("x", "xxxxxxxxxx")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilter
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == LevenshteinPrefilter)
  }

  test("guard appears in the optimized plan and results are unchanged") {
    // build a FRESH DataFrame inside withRule — QueryExecution memoizes
    // the optimized plan, so reusing the baseline's df would bypass the rule
    val baseline = names.filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().toSet
    withRule {
      val q = names.filter(levenshtein(col("a"), col("b")) <= 2)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein"), s"levenshtein missing:\n$opt")
      assert(opt.toLowerCase.contains("abs(") &&
             opt.toLowerCase.contains("length("),
        s"length-band guard not injected:\n$opt")
      assert(q.collect().toSet === baseline)
    }
  }

  test("rule is idempotent when the guard is already present") {
    withRule {
      val q = names.filter(
        abs(length(col("a")) - length(col("b"))) <= 2 &&
        levenshtein(col("a"), col("b")) <= 2)
      val opt = q.queryExecution.optimizedPlan.toString
      // exactly one guard, not two
      val guards = "abs\\(".r.findAllIn(opt.toLowerCase).length
      assert(guards === 1, s"expected 1 guard, plan:\n$opt")
      assert(q.count() === 3) // (ab,abc), (same,same), (close,clove)
    }
  }

  test("reversed comparison form (k >= levenshtein) is also guarded") {
    withRule {
      val q = names.filter(lit(2) >= levenshtein(col("a"), col("b")))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.toLowerCase.contains("abs("), s"guard missing:\n$opt")
      assert(q.count() === 3)
    }
  }
}
