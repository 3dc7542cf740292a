package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's post-load assertion scripts
  * (`tests/quality_checks_silver.sql`, `tests/quality_checks_gold.sql`)
  * as named violation queries — each returns the offending rows
  * ("Expectation: No Results"), so `runAll` is the executable form of the
  * whole test suite and loaders can feed any of them into Audit.check.
  */
object QualityChecks {

  /** PK null/duplicate (quality_checks_silver.sql:25-30). */
  def pkViolations(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count()
      .filter(col(key).isNull || col("count") > 1)

  /** Unwanted leading/trailing spaces (:34-37,58-61,149-154). */
  def untrimmed(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) =!= trim(col(c)))

  /** Domain check: values outside the standardized set (:40-42,71-73). */
  def outsideDomain(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(!col(c).isin(allowed: _*))

  /** Negative/NULL cost (:65-68). */
  def badCost(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull || col(c) < 0)

  /** Date-order invariant end ≥ start (:77-80). */
  def invertedDates(df: DataFrame, startCol: String, endCol: String): DataFrame =
    df.filter(col(endCol).isNotNull && col(endCol) < col(startCol))

  /** Order must not postdate ship/due (:97-101). */
  def orderAfterShipment(df: DataFrame): DataFrame =
    df.filter(col("sls_order_dt") > col("sls_ship_dt") ||
              col("sls_order_dt") > col("sls_due_dt"))

  /** The business invariant sales = quantity × |price|, all positive,
    * non-null (:105-117). */
  def salesInvariantViolations(df: DataFrame): DataFrame =
    df.filter(
      col("sls_sales").isNull || col("sls_quantity").isNull || col("sls_price").isNull ||
      col("sls_sales") <= 0 || col("sls_quantity") <= 0 ||
      col("sls_sales") =!=
        (col("sls_quantity").cast(DecimalType(19, 4)) * abs(col("sls_price")))
          .cast(DecimalType(19, 4)))

  /** SCD2: exactly one current row per key; expired rows carry expiry
    * dates (ddl_silver.sql:52-54 semantics). */
  def scd2Violations(df: DataFrame, key: String): DataFrame = {
    val multiCurrent = df.filter(col("is_current"))
      .groupBy(col(key)).count().filter(col("count") > 1)
      .select(col(key), lit("multiple_current").as("violation"))
    val expiredNoDate = df.filter(!col("is_current") && col("expiry_date").isNull)
      .select(col(key), lit("expired_without_date").as("violation"))
    multiCurrent.unionByName(expiredNoDate)
  }

  /** Gold surrogate uniqueness (quality_checks_gold.sql:22-39). */
  def surrogateDuplicates(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count().filter(col("count") > 1)

  /** Fact↔dim connectivity / orphan detection (:45-51). */
  def orphanFacts(fact: DataFrame, dim: DataFrame, fk: String, pk: String): DataFrame =
    fact.join(dim.select(col(pk)), fact(fk) === dim(pk), "left")
      .filter(dim(pk).isNull)

  /** Run the whole ported suite against a loaded warehouse; returns
    * (check name → violation count). All-zero = the reference's
    * "Expectation: No Results" across the board. */
  def runAll(spark: SparkSession, wh: Warehouse): Map[String, Long] = {
    val cust = wh.read(spark, "silver", "crm_cust_info")
    val prd = wh.read(spark, "silver", "crm_prd_info")
    val sales = wh.read(spark, "silver", "crm_sales_details")
    val dc = wh.read(spark, "gold", "dim_customers")
    val dp = wh.read(spark, "gold", "dim_products")
    val f = wh.read(spark, "gold", "fact_sales")
    Map(
      "cust_pk" -> pkViolations(cust, "cst_id").count(),
      "cust_trim_first" -> untrimmed(cust, "cst_firstname").count(),
      "cust_trim_last" -> untrimmed(cust, "cst_lastname").count(),
      "cust_marital_domain" -> outsideDomain(cust, "cst_marital_status",
        Seq("Married", "Single", "n/a")).count(),
      "cust_gender_domain" -> outsideDomain(cust, "cst_gndr",
        Seq("Male", "Female", "n/a")).count(),
      "prd_cost" -> badCost(prd, "prd_cost").count(),
      "prd_line_domain" -> outsideDomain(prd, "prd_line",
        Seq("Mountain", "Road", "Other Sales", "Touring", "n/a")).count(),
      "prd_dates" -> invertedDates(prd, "prd_start_dt", "prd_end_dt").count(),
      "prd_scd2" -> scd2Violations(prd, "prd_id").count(),
      "sales_date_order" -> orderAfterShipment(sales).count(),
      "sales_invariant" -> salesInvariantViolations(
        sales.filter(col("sls_order_dt").isNotNull)).count(),
      "dim_customers_sk" -> surrogateDuplicates(dc, "customer_key").count(),
      "dim_products_sk" -> surrogateDuplicates(dp, "product_key").count(),
      "fact_orphan_product" -> orphanFacts(
        f.filter(col("product_key") =!= -1L), dp, "product_key", "product_key").count(),
      "fact_orphan_customer" -> orphanFacts(
        f.filter(col("customer_key") =!= -1L), dc, "customer_key", "customer_key").count())
  }
}
