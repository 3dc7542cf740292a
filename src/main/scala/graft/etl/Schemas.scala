package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for every warehouse table (SURVEY.md §1.3-1.4).
  *
  * The engine never infers schemas: bronze CSVs load into these exact
  * StructTypes, mirroring the reference DDL (`scripts/bronze/ddl_bronze.sql`,
  * `ddl_silver.sql`, `ddl_gold.sql`). MONEY columns are DecimalType(19,4)
  * so revenue reconciliation is exact; raw-quirk columns (yyyyMMdd INT
  * dates, dd-MM-yyyy product-date strings) keep their dirty types in bronze
  * and are cleaned in silver.
  */
object Schemas {

  // ----- bronze (raw contracts; ddl_bronze.sql:16-89) -----

  val crmCustInfo: StructType = StructType(Seq(
    StructField("cst_id", IntegerType),
    StructField("cst_key", StringType),
    StructField("cst_firstname", StringType),
    StructField("cst_lastname", StringType),
    StructField("cst_marital_status", StringType),
    StructField("cst_gndr", StringType),
    StructField("cst_create_date", DateType)))

  /** prd dates arrive as dd-MM-yyyy strings (FIXTURES.md A2) — kept raw in
    * bronze, parsed in silver (Cleaning.parseDmyDate). */
  val crmPrdInfo: StructType = StructType(Seq(
    StructField("prd_id", IntegerType),
    StructField("prd_key", StringType),
    StructField("prd_nm", StringType),
    StructField("prd_cost", IntegerType),
    StructField("prd_line", StringType),
    StructField("prd_start_dt", StringType),
    StructField("prd_end_dt", StringType)))

  /** sales dates are yyyyMMdd INTs, incl. 0 / garbage (ddl_bronze.sql:50-52). */
  val crmSalesDetails: StructType = StructType(Seq(
    StructField("sls_ord_num", StringType),
    StructField("sls_prd_key", StringType),
    StructField("sls_cust_id", IntegerType),
    StructField("sls_order_dt", IntegerType),
    StructField("sls_ship_dt", IntegerType),
    StructField("sls_due_dt", IntegerType),
    StructField("sls_sales", DecimalType(19, 4)),
    StructField("sls_quantity", IntegerType),
    StructField("sls_price", DecimalType(19, 4))))

  val erpLocA101: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("cntry", StringType)))

  val erpCustAz12: StructType = StructType(Seq(
    StructField("cid", StringType),
    StructField("bdate", DateType),
    StructField("gen", StringType)))

  val erpPxCatG1v2: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("cat", StringType),
    StructField("subcat", StringType),
    StructField("maintenance", StringType)))

  /** source file name → (bronze table name, schema) — drives BronzeLoader. */
  val bronzeSources: Seq[(String, String, StructType)] = Seq(
    ("cust_info.csv", "crm_cust_info", crmCustInfo),
    ("prd_info.csv", "crm_prd_info", crmPrdInfo),
    ("sales_details.csv", "crm_sales_details", crmSalesDetails),
    ("LOC_A101.csv", "erp_loc_a101", erpLocA101),
    ("CUST_AZ12.csv", "erp_cust_az12", erpCustAz12),
    ("PX_CAT_G1V2.csv", "erp_px_cat_g1v2", erpPxCatG1v2))
}
