package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier23Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier23QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ml_eval_report confusion cells reconcile and metrics derive") {
    val got = Frontier23Queries.queries("ml_eval_report")(spark, sf)
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        col("accuracy_r"), col("precision_r"), col("recall_r"),
        col("f1_r"), col("mcc_r"))
      .as[(Long, Long, Long, Long, Double, Double, Double, Double,
        Double)].collect().head
    val (tp, fp, tn, fn) = (got._1, got._2, got._3, got._4)
    val total = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(when(year(col("o_orderdate")) < 1998,
        col("o_totalprice"))).as("pre"))
      .filter(col("pre").isNotNull).count()
    assert(tp + fp + tn + fn === total)
    // metric identities
    assert(math.abs(got._5 - (tp + tn).toDouble / total) < 1e-6)
    assert(math.abs(got._6 - tp.toDouble / (tp + fp)) < 1e-6)
    assert(math.abs(got._7 - tp.toDouble / (tp + fn)) < 1e-6)
    val f1 = 2.0 * got._6 * got._7 / (got._6 + got._7)
    assert(math.abs(got._8 - f1) < 1e-4, s"f1 ${got._8} vs $f1")
    assert(got._9 >= -1.0 && got._9 <= 1.0)
    // median split puts about half the customers on each side
    assert(math.abs((tp + fp) - (tn + fn)) <= total / 10 + 2,
      "median threshold splits near-evenly")
  }

  test("ev_user_similarity finds genuinely mix-similar users") {
    val got = Frontier23Queries.queries("ev_user_similarity")(spark, sf)
      .select(col("probe"), col("rnk"), col("user_id"), col("cosine"))
      .as[(Long, Int, Long, String)].collect()
    val probes = got.map(_._1).distinct
    assert(probes.length === 5)
    got.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length))
      rs.foreach { case (p, _, u, c) =>
        assert(u !== p, "self excluded")
        assert(BigDecimal(c) > 0 && BigDecimal(c) <= 1)
      }
      // scores non-increasing along ranks
      rs.sortBy(_._2).map(r => BigDecimal(r._4)).sliding(2).foreach {
        case Array(x, y) => assert(x >= y)
        case _ => ()
      }
    }
    // rank-1 neighbor beats a brute-force random other user for the
    // first probe (sanity of the cosine ordering)
    val mix = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (u, xs) =>
        val tot = xs.map(_._3).sum.toDouble
        u -> xs.map(x => x._2 ->
          BigDecimal(x._3 / tot).setScale(6,
            BigDecimal.RoundingMode.HALF_UP)).toMap
      }
    def cos(a: Map[String, BigDecimal], b: Map[String, BigDecimal]) = {
      val keys = a.keySet ++ b.keySet
      val dot = keys.toSeq.map(k =>
        a.getOrElse(k, BigDecimal(0)) * b.getOrElse(k, BigDecimal(0))).sum
      val na = a.values.map(v => v * v).sum
      val nb = b.values.map(v => v * v).sum
      dot.toDouble / math.sqrt((na * nb).toDouble)
    }
    val p0 = got.head._1
    val best = got.filter(r => r._1 == p0 && r._2 == 1).head._3
    val others = mix.keys.filter(u => u != p0 && u != best)
    val bestCos = cos(mix(p0), mix(best))
    others.foreach { u =>
      assert(cos(mix(p0), mix(u)) <= bestCos + 1e-6,
        s"user $u beats reported best")
    }
  }

  test("f_json_pack round-trips keys and arrays through JSON") {
    val got = Frontier23Queries.queries("f_json_pack")(spark, sf)
      .select(col("pri_back"), col("n_orders"), col("n_key_roundtrip"),
        col("n_missing_null"), col("first_line_sum"), col("total_lines"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 5) // the five order priorities
    val totalOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(got.map(_._2).sum === totalOrders)
    got.foreach { case (pri, n, rt, miss, _, _) =>
      assert(pri.nonEmpty)
      assert(rt === n, s"$pri: every key must round-trip")
      assert(miss === n, s"$pri: missing path is NULL for every doc")
    }
    // total_lines equals the raw lineitem count for orders present
    val lineCount = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(got.map(_._6).sum === lineCount)
    // first_line extracts element [0] of the SORTED array = the min
    // linenumber per order
    val expFirstSum = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_linenumber")).as("mn"))
      .agg(sum(col("mn"))).as[Long].collect().head
    assert(got.map(_._5).sum === expFirstSum)
  }
}
