package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.money

/** Warehouse-layer aggregation/join queries — the analytics the
  * reference's star schema exists to serve. All money math is decimal
  * (order-independent, exact) so results are bit-stable under any
  * shuffle schedule — see SURVEY.md §6.
  */
object Analytics {

  /** Grouped pricing summary over lineitem (TPC-H Q1 shape): partial
    * aggregation (map-side combine) + single shuffle on the 2 group
    * keys; scan is pruned to the 7 referenced columns.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.select(
        col("l_returnflag"), col("l_linestatus"),
        money(col("l_quantity")).as("qty"),
        money(col("l_extendedprice")).as("price"),
        money(col("l_discount")).as("disc"),
        money(col("l_tax")).as("tax"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_base_price"),
        sum(col("price") * (lit(1) - col("disc"))).cast("double").as("sum_disc_price"),
        sum(col("price") * (lit(1) - col("disc")) * (lit(1) + col("tax"))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
