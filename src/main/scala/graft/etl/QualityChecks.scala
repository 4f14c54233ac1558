package graft.etl

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test layer of the reference
  * (`dbt-project-glamira` ships dbt's not_null / unique /
  * relationships test machinery) re-expressed as Spark assertions
  * that return one row per check with a violation count, so a
  * pipeline can gate loads on `max(violations) == 0`.
  *
  * Each check is a single aggregation or anti-join — at 100 TB every
  * one is one scan (or one broadcast anti-join) with partial
  * aggregation; nothing materializes violation rows unless asked.
  */
object QualityChecks {

  private def check(name: String, violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** The engine's standing quality suite over the warehouse tables. */
  def dataQualitySummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val checks = Seq(
      // not_null: fact keys
      check("orders_custkey_not_null",
        t.orders.filter(col("o_custkey").isNull)),
      // unique: primary keys
      check("orders_orderkey_unique",
        t.orders.groupBy(col("o_orderkey")).count().filter(col("count") > 1)),
      check("customer_custkey_unique",
        t.customer.groupBy(col("c_custkey")).count().filter(col("count") > 1)),
      // relationships (referential integrity): anti-joins
      check("orders_custkey_fk_customer",
        t.orders.join(broadcast(t.customer),
          col("o_custkey") === col("c_custkey"), "left_anti")),
      check("lineitem_orderkey_fk_orders",
        t.lineitem.select(col("l_orderkey"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"), "left_anti")),
      check("nation_regionkey_fk_region",
        t.nation.join(broadcast(t.region),
          col("n_regionkey") === col("r_regionkey"), "left_anti")),
      // accepted_values (dbt accepted_values test)
      check("orders_status_accepted_values",
        t.orders.filter(!col("o_orderstatus").isin("O", "F", "P"))),
      // range sanity
      check("lineitem_quantity_positive",
        t.lineitem.filter(col("l_quantity") <= 0)))
    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  val dataQualitySummarySql: String =
    """SELECT check_name, violations FROM (
      |  SELECT 'orders_custkey_not_null' AS check_name,
      |         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations
      |  UNION ALL SELECT 'orders_orderkey_unique',
      |         (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
      |  UNION ALL SELECT 'customer_custkey_unique',
      |         (SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1))
      |  UNION ALL SELECT 'orders_custkey_fk_customer',
      |         (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |  UNION ALL SELECT 'lineitem_orderkey_fk_orders',
      |         (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |  UNION ALL SELECT 'nation_regionkey_fk_region',
      |         (SELECT count(*) FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
      |  UNION ALL SELECT 'orders_status_accepted_values',
      |         (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P'))
      |  UNION ALL SELECT 'lineitem_quantity_positive',
      |         (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
      |) ORDER BY check_name""".stripMargin
}
