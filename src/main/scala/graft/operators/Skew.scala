package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.money
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling patterns (SURVEY.md §5). AQE's skew-join splitting
  * covers joins; for *aggregations* on heavily-skewed keys the classic
  * fix is explicit two-stage salting, exposed here as a reusable
  * helper. Results are identical to a direct groupBy (the oracle for
  * the demo query below IS the plain GROUP BY).
  */
object Skew {

  /** Two-stage salted sum: stage 1 spreads each hot key over
    * `buckets` salted partials (shuffle keys (key, salt) — no single
    * reducer owns a hot key), stage 2 merges the ≤`buckets` partial
    * rows per key. For decimal/long measures both stages are exact,
    * so salting is invisible in the result.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(value).as("_partial"), count(lit(1)).as("_n"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("salted_sum"), sum(col("_n")).as("n_rows"))
  }

  /** Demo on the most skewed key in the data (3 return-flag values over
    * the whole lineitem table): salted revenue per flag. Oracle = the
    * plain GROUP BY, proving the two-stage rewrite is result-identical.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_returnflag"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
    saltedSum(li, Seq("l_returnflag"), col("rev"))
      .select(col("l_returnflag"), col("salted_sum").cast("double").as("revenue"),
        col("n_rows"))
      .orderBy("l_returnflag")
  }

  val saltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unique-entity extraction with per-group counts (the reference's
    * ip_processor "extract unique IPs" aggregation pipeline, reference:
    * `5.data-collection-storage/ip_processor.py:70-101`
    * save_unique_ips_to_file).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val distinctCountsSql: String =
    """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
