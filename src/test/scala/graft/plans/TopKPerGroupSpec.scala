package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** The native per-group top-k operator must be indistinguishable from
  * the row_number window formulation — under any partition layout,
  * with ties (broken by the tiebreak column), with k larger than a
  * group, and with empty input. Also pins the physical shape: partial
  * AND final execs present, exchange between them.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private def sample = {
    val rnd = new scala.util.Random(11)
    (1 to 2000).map { i =>
      (i.toLong, s"g${rnd.nextInt(7)}", rnd.nextInt(50).toLong)
    }.toDF("id", "g", "v")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("id", "g", "v").as[(Long, String, Long)].collect().toSet
  }

  test("equals the window formulation, ties included (k=5)") {
    val df = sample
    val got = TopKPerGroup.topK(df, Seq("g"),
        Seq(("v", true), ("id", false)), 5)
      .select("id", "g", "v").as[(Long, String, Long)].collect().toSet
    assert(got === windowTopK(df, 5))
    assert(got.size === 35) // 7 groups x 5
  }

  test("equality holds under different partition layouts") {
    Seq(1, 3, 16, 64).foreach { p =>
      val df = sample.repartition(p)
      val got = TopKPerGroup.topK(df, Seq("g"),
          Seq(("v", true), ("id", false)), 4)
        .select("id", "g", "v").as[(Long, String, Long)].collect().toSet
      assert(got === windowTopK(sample, 4), s"partitions=$p")
    }
  }

  test("k larger than the group keeps the whole group") {
    val tiny = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "g", "v")
    val got = TopKPerGroup.topK(tiny, Seq("g"),
        Seq(("v", true), ("id", false)), 100)
      .count()
    assert(got === 3L)
  }

  test("empty input yields empty output") {
    val none = Seq.empty[(Long, String, Long)].toDF("id", "g", "v")
    assert(TopKPerGroup.topK(none, Seq("g"),
      Seq(("v", true), ("id", false)), 3).count() === 0L)
  }

  test("physical plan is partial -> exchange -> final") {
    val plan = TopKPerGroup.topK(sample, Seq("g"),
        Seq(("v", true), ("id", false)), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    val pPartial = plan.indexOf("TopKPartial")
    val pFinal = plan.indexOf("TopKFinal")
    val pExchange = plan.indexOf("Exchange hashpartitioning")
    assert(pFinal < pExchange && pExchange < pPartial,
      s"expected final above exchange above partial:\n$plan")
  }

  test("partial pass bounds rows entering the shuffle") {
    // 1 group, 2000 rows, 8 partitions, k=2: the exchange must carry
    // at most k rows per partition = 16, not 2000
    val df = sample.withColumn("g", lit("hot")).repartition(8)
    val analyzed = df.queryExecution.analyzed
    val partialOnly = TopKPartialExec(
      Seq(TopKPerGroup.attr(analyzed, "g")),
      Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
        TopKPerGroup.attr(analyzed, "v"),
        org.apache.spark.sql.catalyst.expressions.Descending)),
      2, df.queryExecution.executedPlan)
    val n = partialOnly.execute().count()
    assert(n <= 16, s"partial emitted $n rows")
  }
}
