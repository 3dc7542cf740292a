package graft.security

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.TestSessions

class SecureSpec extends AnyFunSuite {
  lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val dim = Seq(
    (1L, "Ana", "Lopez", "United States", java.sql.Date.valueOf("1980-01-05")),
    (2L, "Ben", "Kim", "Germany", java.sql.Date.valueOf("1975-06-10"))
  ).toDF("customer_key", "first_name", "last_name", "country", "birth_date")

  test("rowFilter: allowlist filters, missing user denies everything") {
    val access = Map("alice" -> Seq("Germany"))
    val filtered = Secure.rowFilter(dim, "country", "alice", access)
    assert(filtered.select("customer_key").as[Long].collect().toSeq === Seq(2L))
    assert(Secure.rowFilter(dim, "country", "mallory", access).count() === 0)
  }

  test("classifiedView: PII masked for analysts, visible to managers") {
    val analyst = Secure.classifiedView(dim, "dim_customers", role = "analyst")
    assert(analyst.select("first_name").distinct().head().getString(0) === "***MASKED***")
    // non-string PII nulls out but KEEPS its type (schema contract)
    assert(analyst.schema("birth_date").dataType
      === org.apache.spark.sql.types.DateType)
    assert(analyst.filter(col("birth_date").isNotNull).count() === 0)
    // non-PII Confidential column untouched by the PII rule
    assert(analyst.select("country").as[String].collect().toSet
      === Set("United States", "Germany"))
    val mgr = Secure.classifiedView(dim, "dim_customers", role = "manager")
    assert(mgr.select("first_name").as[String].collect().toSet === Set("Ana", "Ben"))
    assert(mgr.filter(col("birth_date").isNull).count() === 0)
  }

  test("maskUnless resolves at plan time") {
    val masked = dim.select(Secure.maskUnless(col("customer_key"), "analyst",
      Seq("manager")).as("k"))
    assert(masked.distinct().head().getDouble(0) === 0.0)
  }
}
