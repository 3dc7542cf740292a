package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-level security views over gold tables (SURVEY.md §2.10).
  *
  * The reference implements row-level security as an inline TVF joined by a
  * security policy (`ddl_security.sql:69-97`) and masking as a column rule
  * (`:104-111`). Both are parameterized view builders here — pure plan
  * transforms, so Catalyst still pushes filters/pruning through them.
  */
object Secure {

  /** user → allowed dimension values (the reference's
    * `Security.UserCountryMapping`, ddl_security.sql:36-58). */
  type AccessMap = Map[String, Seq[String]]

  /** X1 — RLS: restrict `fact` to rows whose `dimValueCol` is in the user's
    * allowlist. A literal IN-list compiles to a broadcast-free predicate the
    * scanner can push down; an empty allowlist yields no rows (deny by
    * default, matching the reference's INNER JOIN policy). */
  def rowFilter(fact: DataFrame, dimValueCol: String, user: String,
                access: AccessMap): DataFrame = {
    val allowed = access.getOrElse(user, Seq.empty)
    if (allowed.isEmpty) fact.filter(lit(false))
    else fact.filter(col(dimValueCol).isin(allowed: _*))
  }

  /** X2 — dynamic data masking on orders' total price: analysts see the
    * default mask (0.0), managers see through (`UNMASK`). */
  def maskedOrders(orders: DataFrame, role: String): DataFrame =
    orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      maskUnless(col("o_totalprice"), role, unmaskedRoles = Seq("manager"))
        .as("o_totalprice_masked"))

  /** Column-level mask: zero unless the role is allowed to unmask. The role
    * is known at plan time, so the branch resolves before execution —
    * managers get the raw column, others a constant literal. */
  def maskUnless(c: Column, role: String, unmaskedRoles: Seq[String]): Column =
    if (unmaskedRoles.contains(role)) c.cast("double") else lit(0.0)

  // ------------------------------------------------------------------ X4

  /** Sensitivity classification metadata (ddl_security.sql:118-128):
    * table.column → label. Drives both documentation and the masking
    * decision below. */
  val classification: Map[String, String] = Map(
    "dim_customers.first_name" -> "PII",
    "dim_customers.last_name" -> "PII",
    "dim_customers.birth_date" -> "PII",
    "dim_customers.country" -> "Confidential",
    "fact_sales.sales_amount" -> "Confidential",
    "fact_sales.price" -> "Confidential")

  /** Classification-driven projection: every column labeled PII is masked
    * unless the role may unmask — the metadata map is the single source
    * of truth, so adding a label protects every derived view. */
  def classifiedView(df: DataFrame, tableName: String, role: String,
                     unmaskedRoles: Seq[String] = Seq("manager")): DataFrame =
    df.select(df.columns.map { c =>
      classification.get(s"$tableName.$c") match {
        case Some("PII") if !unmaskedRoles.contains(role) =>
          // type-preserving masks: the view's schema must stay identical
          // to the table contract it protects (strings get a sentinel,
          // other types null out)
          df.schema(c).dataType match {
            case org.apache.spark.sql.types.StringType => lit("***MASKED***").as(c)
            case dt => lit(null).cast(dt).as(c)
          }
        case _ => col(c)
      }
    }: _*)

  /** Access-audit row (the reference's audit spec,
    * ddl_security.sql:169-180): who read which table when. Appended to
    * `audit/access_log` by the caller's Warehouse. */
  def accessLogEntry(spark: org.apache.spark.sql.SparkSession, user: String,
                     table: String, action: String): DataFrame = {
    import spark.implicits._
    Seq((user, table, action,
      new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("user_name", "table_name", "action", "access_time")
  }
}
