package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

/** Semantic pins for the Frontier36Queries pack (the driver oracle
  * hash-checks exact values; these specs pin meaning on sf0.001).
  */
class Frontier36QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("s31_dict_advisor byte math is exact and verdicts follow it") {
    val got = Frontier36Queries.queries("s31_dict_advisor")(spark, sf)
      .select(col("column_name"), col("n_rows"), col("n_distinct"),
        col("raw_bytes"), col("dict_bytes"), col("card_ratio_r"),
        col("encode"))
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(got.length === 4)
    got.foreach { case (cn, n, nd, raw, dict, ratio, enc) =>
      assert(nd <= n, cn)
      assert(math.abs(ratio - nd.toDouble / n) < 1e-6)
      assert(enc === (dict < raw), cn)
    }
    // wide low-cardinality columns encode; the 1-char status column
    // does NOT (a 4-byte code per row costs more than the raw byte),
    // and the near-unique name does not either
    val bySeg = got.map(r => r._1 -> r._7).toMap
    assert(!bySeg("o_orderstatus"), "1-char column must not encode")
    assert(bySeg("o_orderpriority"))
    assert(bySeg("c_mktsegment"))
    assert(!bySeg("c_name"), "near-unique c_name must not encode")
    // exact rebuild for one column
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority")).as[String].collect()
    val row = got.find(_._1 == "o_orderpriority").get
    assert(row._2 === exp.length.toLong)
    assert(row._4 === exp.map(_.length).sum.toLong)
    assert(row._5 === exp.distinct.map(_.length).sum + 4L * exp.length)
  }

  test("ml_learning_curve uses nested slices and a fixed eval fold") {
    val got = Frontier36Queries.queries("ml_learning_curve")(spark, sf)
      .select(col("train_pct"), col("n_train"), col("val_mse_m_r"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(25, 50, 75, 100))
    // nested training pools grow strictly
    got.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a < b)
      case _ => ()
    }
    got.foreach { case (_, n, mse) =>
      assert(n > 0)
      assert(mse > 0)
    }
    // the largest slice should be at least as good as the smallest
    // (within slack — a one-split stump saturates fast)
    assert(got.last._3 <= got.head._3 * 1.5)
  }

  test("f_argmax_pack agrees with window-based greatest-per-group") {
    val got = Frontier36Queries.queries("f_argmax_pack")(spark, sf)
      .select(col("n_name"), col("top_order_key"),
        col("top_order_priority"), col("top_price"),
        col("first_order_key"), col("first_date"))
      .as[(String, Long, String, String, Long, String)].collect()
    assert(got.length === 25)
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").cast("string"),
        col("o_orderpriority"),
        to_date(col("o_orderdate")).cast("string"))
      .as[(String, Long, String, String, String)].collect()
      .groupBy(_._1)
    got.foreach { case (n, tk, tp, price, fk, fd) =>
      val grp = rows(n)
      val top = grp.maxBy(r => (BigDecimal(r._3), -r._2))
      assert(tk === top._2, s"$n top key")
      assert(tp === top._4, s"$n top priority")
      assert(BigDecimal(price) === grp.map(r => BigDecimal(r._3)).max)
      val first = grp.minBy(r => (r._5, r._2))
      assert(fk === first._2, s"$n first key")
      assert(fd === grp.map(_._5).min)
    }
  }
}
