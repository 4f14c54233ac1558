package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.money
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface completions — operators whose point is the SURFACE
  * (grouping sets, discrete percentiles, unpivot, nearest-asof), so a
  * reference user migrating real warehouse SQL finds every shape they
  * already write. Float discipline as everywhere: exact ints/decimals
  * under every double, shared expression text.
  */
object SqlSurfaces {

  /** NAMED grouping sets — the NON-hierarchical aggregation shape
    * `rollup_sales`/`cube_sales` can't express (cube = all 2ⁿ sets,
    * rollup = the hierarchy; real dashboards want a curated list):
    * (region × priority), (region), (grand total) — but NOT
    * (priority) alone. One shuffle serves all three sets (Spark
    * expands grouping sets in a single Expand + aggregate, same as
    * cube), with grouping_id disambiguating.
    *
    * Scale shape: identical to cube_sales — dims broadcast, one
    * partial-agg pass, Expand multiplies rows by |sets| BEFORE the
    * exchange (3× here, vs cube's 4×).
    */
  def groupingSetsProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val joined = t.orders.select(col("o_custkey"), col("o_orderpriority"),
        money(col("o_totalprice")).as("price"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
    joined
      .groupingSets(
        Seq(Seq(col("r_name"), col("o_orderpriority")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("o_orderpriority"))
      .agg(sum(col("price")).cast("double").as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid").cast("int").as("gid"), col("total_price"), col("n_orders"))
      .orderBy("gid", "region", "priority")
  }

  val groupingSetsProfileSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(r_name, o_orderpriority) AS INTEGER) AS gid,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
      |ORDER BY gid, region, priority""".stripMargin

  /** Discrete vs continuous percentile semantics side by side: p50
    * and p90 as percentile_disc (an ACTUAL data value — the semantics
    * SLA reporting wants: "a real observed latency", never an
    * interpolated phantom) next to the interpolating percentile_cont.
    * disc values are exact data doubles — no rounding needed; cont
    * follows the rounded-4 parity convention.
    *
    * Scale shape: one grouped sort-based aggregate per group; the GK
    * approx swap documented on quantileProfileApprox applies to both
    * at 100 TB.
    */
  def percentileDiscProfile(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50_disc"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90_disc"),
        round(expr("percentile(value, 0.5)"), 4).as("p50_cont"),
        round(expr("percentile(value, 0.9)"), 4).as("p90_cont"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val percentileDiscProfileSql: String =
    """SELECT event_type,
      |  quantile_disc(value, 0.5) AS p50_disc,
      |  quantile_disc(value, 0.9) AS p90_disc,
      |  round(quantile_cont(value, 0.5), 4) AS p50_cont,
      |  round(quantile_cont(value, 0.9), 4) AS p90_cont,
      |  count(*) AS n
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Wide→long UNPIVOT of a per-flag metrics row — the melt that
    * turns a dashboard's wide aggregate into the (dimension, metric,
    * value) long form metric stores and chart APIs ingest. Spark's
    * native `unpivot` (Expand-based, one pass, no join); values are
    * exact decimal casts to double.
    *
    * Scale shape: the unpivot runs on the ALREADY-AGGREGATED wide
    * frame (|groups| rows), multiplying it by |metrics| — never the
    * fact table.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,0)")).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_lines"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_lines")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  val unpivotMetricsSql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sum_qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(count(*) AS DOUBLE) AS n_lines
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
      |UNION ALL SELECT l_returnflag, 'n_lines', n_lines FROM wide
      |ORDER BY l_returnflag, metric""".stripMargin

  /** NEAREST as-of: each event matched to the temporally CLOSEST
    * order of the same user, either side (ties → the preceding one)
    * — completing the as-of family's three directions (backward
    * `asof_event_order`, forward `..._forward`, nearest here). Both
    * directions come from the SAME union-merge frame in one shuffle:
    * two window passes (one per sort direction) over one partition
    * of the data, then a three-way comparison picks the side.
    *
    * Scale shape: identical to the sibling as-ofs — one user-keyed
    * shuffle, two sorts, no join of events×orders ever forms.
    */
  def asofEventOrderNearest(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.select(
      col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
      lit(0).as("is_event"),
      col("o_orderkey").as("ord_key"),
      lit(null).cast("long").as("event_id"))
    val e = t.events.select(
      col("user_id").as("uid"), col("ts_us"), lit(1).as("is_event"),
      lit(null).cast("long").as("ord_key"), col("event_id"))
    val wB = Window.partitionBy("uid")
      .orderBy(col("ts_us"), col("is_event"), col("ord_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("uid")
      .orderBy(col("ts_us").desc, col("is_event").asc, col("ord_key").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("prev_key", last(col("ord_key"), ignoreNulls = true).over(wB))
      .withColumn("prev_ts",
        last(when(col("is_event") === 0, col("ts_us")), ignoreNulls = true).over(wB))
      .withColumn("next_key", last(col("ord_key"), ignoreNulls = true).over(wF))
      .withColumn("next_ts",
        last(when(col("is_event") === 0, col("ts_us")), ignoreNulls = true).over(wF))
      .filter(col("is_event") === 1)
      .withColumn("use_prev",
        col("next_ts").isNull ||
          (col("prev_ts").isNotNull &&
            (col("ts_us") - col("prev_ts")) <= (col("next_ts") - col("ts_us"))))
      .select(col("event_id"), col("uid").as("user_id"),
        when(col("use_prev"), col("prev_key")).otherwise(col("next_key"))
          .as("nearest_order_key"),
        when(col("use_prev"), col("prev_ts")).otherwise(col("next_ts"))
          .as("nearest_order_ts_us"),
        when(col("use_prev"), lit("prev")).otherwise(lit("next")).as("side"))
      .orderBy("event_id")
  }

  val asofEventOrderNearestSql: String =
    """WITH u AS (
      |  SELECT o_custkey AS uid, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ts_us,
      |    0 AS is_event, o_orderkey AS ord_key, CAST(NULL AS BIGINT) AS event_id
      |  FROM orders
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), 1, CAST(NULL AS BIGINT), event_id FROM events),
      |m AS (
      |  SELECT *,
      |    last_value(ord_key IGNORE NULLS) OVER
      |      (PARTITION BY uid ORDER BY ts_us, is_event, ord_key
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_key,
      |    last_value(CASE WHEN is_event = 0 THEN ts_us END IGNORE NULLS) OVER
      |      (PARTITION BY uid ORDER BY ts_us, is_event, ord_key
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
      |    last_value(ord_key IGNORE NULLS) OVER
      |      (PARTITION BY uid ORDER BY ts_us DESC, is_event ASC, ord_key DESC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_key,
      |    last_value(CASE WHEN is_event = 0 THEN ts_us END IGNORE NULLS) OVER
      |      (PARTITION BY uid ORDER BY ts_us DESC, is_event ASC, ord_key DESC
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_ts
      |  FROM u),
      |p AS (
      |  SELECT *,
      |    (next_ts IS NULL OR (prev_ts IS NOT NULL
      |      AND (ts_us - prev_ts) <= (next_ts - ts_us))) AS use_prev
      |  FROM m WHERE is_event = 1)
      |SELECT event_id, uid AS user_id,
      |  CASE WHEN use_prev THEN prev_key ELSE next_key END AS nearest_order_key,
      |  CASE WHEN use_prev THEN prev_ts ELSE next_ts END AS nearest_order_ts_us,
      |  CASE WHEN use_prev THEN 'prev' ELSE 'next' END AS side
      |FROM p ORDER BY event_id""".stripMargin
}
