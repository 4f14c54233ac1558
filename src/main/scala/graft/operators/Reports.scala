package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.money
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BI-report layer over the star schema — the queries the reference's
  * stage-7 dashboards run against the dbt marts (rollups, percentile
  * profiles, as-of enrichment).
  */
object Reports {

  /** Region→nation ROLLUP of sales revenue: one pass produces the
    * nation rows, the region subtotals, and the grand total (partial
    * aggregation handles all grouping sets in the same shuffle).
    */
  def rollupSales(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.select(col("l_orderkey"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"),
        grouping_id().as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("revenue"), col("n_lines"), col("gid"))
      .orderBy("gid", "region_name", "nation_name")
  }

  val rollupSalesSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region_name,
      |  coalesce(n_name, 'ALL') AS nation_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines,
      |  GROUPING(r_name, n_name) AS gid
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY gid, region_name, nation_name""".stripMargin

  /** Region × priority CUBE: all four grouping-set combinations
    * (detail, per-region, per-priority, grand total) in ONE shuffle —
    * the multi-dimensional dashboard matrix the per-level UNION ALL
    * formulation would pay 4 scans + 4 shuffles for. Dims broadcast;
    * decimal money math.
    */
  def cubeSales(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.select(col("o_custkey"), col("o_orderpriority"),
        money(col("o_totalprice")).as("price"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg(sum(col("price")).cast("double").as("total_price"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid").cast("int").as("gid"), col("total_price"), col("n_orders"))
      .orderBy("gid", "region", "priority")
  }

  val cubeSalesSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(r_name, o_orderpriority) AS INTEGER) AS gid,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, o_orderpriority)
      |ORDER BY gid, region, priority""".stripMargin

  /** Fixed-width value histogram (20 bins over the observed range) —
    * the data-profiling primitive. Two passes: one tiny min/max agg
    * (broadcast as a single row), one map-side bin assignment +
    * partial-aggregated count. Bin edges are double arithmetic with
    * identical operand order on both engines, so bin membership is
    * exact even at the boundaries.
    */
  def histogramPrice(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.select(col("o_totalprice"))
    val bounds = o.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    o.crossJoin(broadcast(bounds))
      // degenerate range (all values equal) → everything in bin 0;
      // without the guard the bin division is 0/0 on both engines
      .select(when(col("hi") === col("lo"), 0)
        .otherwise(least(
          floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / lit(20.0))).cast("int"),
          lit(19))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("bin")
  }

  val histogramPriceSql: String =
    """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
      |h AS (SELECT CAST(CASE WHEN hi = lo THEN 0
      |        ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) AS INTEGER), 19) END AS INTEGER) AS bin
      |      FROM orders, b)
      |SELECT bin, count(*) AS n_rows FROM h GROUP BY bin ORDER BY bin""".stripMargin

  /** Ordered list aggregation (the dbt-style "export a delimited list
    * per entity" shape): distinct high-balance customer nations per
    * segment as a sorted CSV. Sort-then-join makes the concatenation
    * order-deterministic (a bare collect_list is shuffle-order
    * dependent — never expose one unsorted); the distinct pre-step
    * keeps the collected arrays bounded by the dim domain, not row
    * count.
    */
  def listaggExport(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.filter(col("c_acctbal") > 9500)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("n_name")).distinct()
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations_csv"))
      .orderBy("c_mktsegment")
  }

  val listaggExportSql: String =
    """WITH x AS (SELECT DISTINCT c_mktsegment, n_name
      |           FROM customer JOIN nation ON c_nationkey = n_nationkey
      |           WHERE c_acctbal > 9500)
      |SELECT c_mktsegment, count(*) AS n_nations,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-group z-score outlier detection (|z| > 2 on event values per
    * type) — the statistical data-quality primitive. Group moments
    * come from ONE pass of exact decimal sums (Σx, Σx², both
    * order-independent), broadcast back over the stream; mean/std/z
    * are then correctly-rounded double ops with fixed operand order,
    * so even the boundary rows match across engines bit for bit.
    */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val m = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("s1"),
        sum(money(col("value")) * money(col("value"))).cast("double").as("s2"))
    val z = (col("value") - col("s1") / col("n")) /
      sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
    ev.join(broadcast(m), "event_type")
      .withColumn("zscore", z)
      .filter(abs(col("zscore")) > 2.0)
      .select(col("event_id"), col("event_type"), col("value"), col("zscore"))
      .orderBy("event_id")
  }

  val anomalyZscoreSql: String =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  (e.value - m.s1 / m.n) / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)) AS zscore
      |FROM events e JOIN m ON m.event_type = e.event_type
      |WHERE abs((e.value - m.s1 / m.n) / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n))) > 2.0
      |ORDER BY e.event_id""".stripMargin

  /** Robust outlier detection via MEDIAN absolute deviation — the
    * companion [[anomalyZscore]] needs when outliers are heavy enough
    * to drag the mean/σ toward themselves and mask each other (the
    * textbook z-score failure; medians don't budge). Flags rows more
    * than 3 MADs from their group median. Two grouped exact
    * percentiles (median of values, then median of |x − med|), each
    * rounded to 4 decimals on both engines (the `quantile_profile`
    * parity convention), broadcast back over the stream; the ratio is
    * one division on exact-rounded inputs → hash-gated. Exact
    * `percentile` buffers whole groups — the 100-TB path is the coded
    * GK sibling [[anomalyMadApprox]].
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
    val withDev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = withDev.groupBy(col("event_type"))
      .agg(round(expr("percentile(dev, 0.5)"), 4).as("mad"))
    // mad > 0 gate, mirrored in the oracle: a degenerate group (≥50%
    // identical values) has MAD = 0, where Spark's non-ANSI Divide
    // yields NULL (row silently dropped) but DuckDB's IEEE semantics
    // yield Infinity (row kept) — so the convention is explicit: a
    // zero-MAD group reports no outliers (deviation is unmeasurable)
    withDev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("mad_ratio", col("dev") / col("mad"))
      .filter(col("mad_ratio") > 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("mad_ratio"))
      .orderBy("event_id")
  }

  val anomalyMadSql: String =
    """WITH med AS (
      |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS dev
      |  FROM events e JOIN med m ON m.event_type = e.event_type),
      |mad AS (
      |  SELECT event_type, round(quantile_cont(dev, 0.5), 4) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_id, d.event_type, d.value, d.med, a.mad,
      |  d.dev / a.mad AS mad_ratio
      |FROM dev d JOIN mad a ON a.event_type = d.event_type
      |WHERE a.mad > 0 AND d.dev / a.mad > 3.0
      |ORDER BY d.event_id""".stripMargin

  /** Scale path for [[anomalyMad]] (VERDICT r9 #1): both grouped
    * medians ride the GK sketch (`approx_percentile`) instead of
    * exact `percentile`, so no group ever buffers its full value list
    * in one aggregation buffer — the sketch is O(accuracy·log n) per
    * group and partial-aggregates map-side, where the exact form
    * holds billions of doubles per 5-key group at 100 TB (OOM, not
    * slowdown). GK returns actual data members (no interpolation, no
    * rounding convention needed) with rank error ≤ n/accuracy —
    * rank-error-tested in Round10Spec. Same mad > 0 degenerate-group
    * gate as the oracled exact form, which remains the hash-gated
    * entry.
    */
  def anomalyMadApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val (_, _, withDev, mad) = madApproxFrames(spark, dir, accuracy)
    withDev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("mad_ratio", col("dev") / col("mad"))
      .filter(col("mad_ratio") > 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("mad_ratio"))
      .orderBy("event_id")
  }

  /** The sketch frames [[anomalyMadApprox]] and its audit share. */
  private def madApproxFrames(spark: SparkSession, dir: String,
      accuracy: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, 0.5, $accuracy)").as("med"))
    val withDev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = withDev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(dev, 0.5, $accuracy)").as("mad"))
    (ev, med, withDev, mad)
  }

  /** Driver-gated audit of [[anomalyMadApprox]] (VERDICT r13 #4, same
    * contract-gating as [[quantileProfileApproxAudit]]): per event
    * type, exact count plus rank-bound booleans for BOTH stacked
    * sketches — the approx median against the value population and
    * the approx MAD against the absolute-deviation population — and a
    * mad-positivity boolean (the op's degenerate-group gate).
    */
  def anomalyMadApproxAudit(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val (_, _, withDev, mad) = madApproxFrames(spark, dir, accuracy)
    val eps = 1.0 / accuracy
    val counts = withDev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") < col("med"), 1L).otherwise(0L)).as("nlt_med"),
        sum(when(col("value") <= col("med"), 1L).otherwise(0L)).as("nle_med"),
        sum(when(col("dev") < col("mad"), 1L).otherwise(0L)).as("nlt_mad"),
        sum(when(col("dev") <= col("mad"), 1L).otherwise(0L)).as("nle_mad"),
        min(when(col("mad") > 0, 1L).otherwise(0L)).as("mp"))
    def rankOk(nm: String) = {
      val n = col("n_events").cast("double")
      ((col(s"nlt_$nm").cast("double") <= lit(0.5) * n + lit(eps) * n + lit(2.0)) &&
        (col(s"nle_$nm").cast("double") >= lit(0.5) * n - lit(eps) * n - lit(2.0)))
        .as(s"${nm}_rank_ok")
    }
    counts.select(col("event_type"), col("n_events"),
        rankOk("med"), rankOk("mad"), (col("mp") === 1L).as("mad_positive"))
      .orderBy("event_type")
  }

  val anomalyMadApproxAuditSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  true AS med_rank_ok, true AS mad_rank_ok, true AS mad_positive
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Tukey-fence outliers: rows outside [p25 − 1.5·IQR, p75 + 1.5·IQR]
    * per event type — the boxplot rule, the third member of the
    * outlier family (z-score assumes normality, MAD resists skew,
    * IQR is the distribution-free default every EDA pass starts
    * with). Quartiles exact-rounded (the percentile parity
    * convention), fences one shared expression with the 1.5 literal
    * CAST to DOUBLE — every comparison bit-identical in the oracle.
    *
    * Scale shape: one grouped-percentile pass (100-TB path coded as
    * [[iqrOutliersApprox]]), fences broadcast back, map-side flag
    * filter.
    */
  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val qs = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"))
      .withColumn("lo_fence",
        expr("p25 - CAST(1.5 AS DOUBLE) * (p75 - p25)"))
      .withColumn("hi_fence",
        expr("p75 + CAST(1.5 AS DOUBLE) * (p75 - p25)"))
    ev.join(broadcast(qs), "event_type")
      .filter(col("value") < col("lo_fence") || col("value") > col("hi_fence"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo_fence"), col("hi_fence"))
      .orderBy("event_id")
  }

  val iqrOutliersSql: String =
    """WITH q AS (
      |  SELECT event_type,
      |    round(quantile_cont(value, 0.25), 4) AS p25,
      |    round(quantile_cont(value, 0.75), 4) AS p75
      |  FROM events GROUP BY 1),
      |f AS (
      |  SELECT event_type,
      |    p25 - CAST(1.5 AS DOUBLE) * (p75 - p25) AS lo_fence,
      |    p75 + CAST(1.5 AS DOUBLE) * (p75 - p25) AS hi_fence
      |  FROM q)
      |SELECT e.event_id, e.event_type, e.value, f.lo_fence, f.hi_fence
      |FROM events e JOIN f ON f.event_type = e.event_type
      |WHERE e.value < f.lo_fence OR e.value > f.hi_fence
      |ORDER BY e.event_id""".stripMargin

  /** Scale path for [[iqrOutliers]] (VERDICT r9 #1): quartiles via
    * the GK sketch — partial-aggregating, O(accuracy·log n) per
    * group, never buffering a group's full value list. The quartiles
    * ride along in the output (they are audit columns here, not part
    * of the oracled contract) so the rank-error bound is directly
    * testable; fences are the same shared 1.5·IQR expression. The
    * exact form remains the hash-gated entry.
    */
  def iqrOutliersApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val qs = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, 0.25, $accuracy)").as("p25"),
        expr(s"approx_percentile(value, 0.75, $accuracy)").as("p75"))
      .withColumn("lo_fence",
        expr("p25 - CAST(1.5 AS DOUBLE) * (p75 - p25)"))
      .withColumn("hi_fence",
        expr("p75 + CAST(1.5 AS DOUBLE) * (p75 - p25)"))
    ev.join(broadcast(qs), "event_type")
      .filter(col("value") < col("lo_fence") || col("value") > col("hi_fence"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("p25"), col("p75"), col("lo_fence"), col("hi_fence"))
      .orderBy("event_id")
  }

  /** Winsorization: clamp each event value into its group's
    * [p05, p95] band — the feature-prep primitive that tames tails
    * BEFORE means/regressions see them (detection is `anomaly_mad`'s
    * job; this is the repair). One grouped exact-percentile pass
    * (rounded-4 parity convention; 100-TB path coded as
    * [[winsorizeApprox]]) broadcast back;
    * the clamp is a map-side least/greatest, flagged so downstream
    * can audit how much mass moved. Clamped values and flags are
    * exact comparisons on rounded bounds → hash-gated.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.05)"), 4).as("lo"),
        round(expr("percentile(value, 0.95)"), 4).as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("value_winsorized"),
        (col("value") < col("lo") || col("value") > col("hi")).as("was_clamped"))
      .orderBy("event_id")
  }

  val winsorizeSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    round(quantile_cont(value, 0.05), 4) AS lo,
      |    round(quantile_cont(value, 0.95), 4) AS hi
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  greatest(b.lo, least(b.hi, e.value)) AS value_winsorized,
      |  (e.value < b.lo OR e.value > b.hi) AS was_clamped
      |FROM events e JOIN b ON b.event_type = e.event_type
      |ORDER BY e.event_id""".stripMargin

  /** Scale path for [[winsorize]] (VERDICT r9 #1): the [p05, p95]
    * clamp band via the GK sketch — partial-aggregating, no full
    * group buffer. The band bounds ride along as audit columns so the
    * rank-error bound is directly testable; the clamp and flag are
    * the same map-side least/greatest. The exact form remains the
    * hash-gated entry.
    */
  def winsorizeApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, 0.05, $accuracy)").as("lo"),
        expr(s"approx_percentile(value, 0.95, $accuracy)").as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("value_winsorized"),
        (col("value") < col("lo") || col("value") > col("hi")).as("was_clamped"))
      .orderBy("event_id")
  }

  /** Driver-gated audit of [[winsorizeApprox]] (VERDICT r13 #4, same
    * contract-gating as [[quantileProfileApproxAudit]]): per event
    * type, exact count plus rank-bound booleans for the two sketched
    * clamp bounds and internal-consistency booleans (clamp flag and
    * winsorized value recompute from the emitted bounds row-for-row).
    * Runs the REAL operator output through the gate — clamped counts
    * themselves are sketch-dependent and so reduced to invariants.
    */
  def winsorizeApproxAudit(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val out = winsorizeApprox(spark, dir, accuracy)
    val eps = 1.0 / accuracy
    val counts = out.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("nlt_lo"),
        sum(when(col("value") <= col("lo"), 1L).otherwise(0L)).as("nle_lo"),
        sum(when(col("value") < col("hi"), 1L).otherwise(0L)).as("nlt_hi"),
        sum(when(col("value") <= col("hi"), 1L).otherwise(0L)).as("nle_hi"),
        min(when(((col("value") < col("lo")) || (col("value") > col("hi")))
          === col("was_clamped"), 1L).otherwise(0L)).as("cc"),
        min(when(col("value_winsorized")
          === greatest(col("lo"), least(col("hi"), col("value"))), 1L)
          .otherwise(0L)).as("wc"))
    def rankOk(q: Double, nm: String) = {
      val n = col("n_events").cast("double")
      ((col(s"nlt_$nm").cast("double") <= lit(q) * n + lit(eps) * n + lit(2.0)) &&
        (col(s"nle_$nm").cast("double") >= lit(q) * n - lit(eps) * n - lit(2.0)))
        .as(s"${nm}_rank_ok")
    }
    counts.select(col("event_type"), col("n_events"),
        rankOk(0.05, "lo"), rankOk(0.95, "hi"),
        (col("cc") === 1L).as("clamp_consistent"),
        (col("wc") === 1L).as("winsor_consistent"))
      .orderBy("event_type")
  }

  val winsorizeApproxAuditSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  true AS lo_rank_ok, true AS hi_rank_ok,
      |  true AS clamp_consistent, true AS winsor_consistent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-series gap-fill: project the event stream onto a dense
    * per-user daily grid and forward-fill missing days with the last
    * observed value (`last(_, ignoreNulls)` over an unbounded-preceding
    * frame) — the standard prep for per-entity daily reporting and
    * feature snapshots. Scale shape: the date spine is one broadcast
    * row-set (days are bounded), the grid is output-sized, and the
    * fill is one window shuffle on user_id; the per-(user, day)
    * dedup-newest is the only other shuffle.
    */
  def fillForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val wd = Window.partitionBy("user_id", "day")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val obs = ev.select(col("user_id"),
        to_date(timestamp_micros(col("ts_us"))).as("day"),
        col("value"), col("ts_us"), col("event_id"))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value"))
      .cache() // read three times: bounds, user list, grid join
    graft.core.OwnedCaches.own(obs)
    val spine = obs.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val grid = obs.select("user_id").distinct().crossJoin(broadcast(spine))
    val wf = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .withColumn("filled_value", last(col("value"), ignoreNulls = true).over(wf))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("filled_value"),
        when(col("value").isNull, 1).otherwise(0).as("was_filled"))
      .orderBy("user_id", "day")
  }

  val fillForwardSql: String =
    """WITH obs AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, value FROM (
      |    SELECT user_id, ts, value,
      |      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |    FROM events) t WHERE rn = 1),
      |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
      |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
      |users AS (SELECT DISTINCT user_id FROM obs),
      |grid AS (SELECT u.user_id, s.day FROM users u CROSS JOIN spine s),
      |ff AS (
      |  SELECT g.user_id, g.day, o.value,
      |    last_value(o.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day)
      |SELECT user_id, CAST(day AS VARCHAR) AS day, filled_value,
      |  CASE WHEN value IS NULL THEN 1 ELSE 0 END AS was_filled
      |FROM ff ORDER BY user_id, day""".stripMargin

  /** Per-priority order-value profile: exact linear-interpolated
    * quantiles (rounded to 4dp — Spark and DuckDB use algebraically
    * equal but differently-associated interpolation formulas).
    */
  def quantileProfile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_orderpriority")

  /** Scale path for [[quantileProfile]]: `approx_percentile`
    * (Greenwald-Khanna) instead of exact `percentile`. Exact
    * `percentile` buffers EVERY group value in executor memory — a
    * skewed group at 100 TB is an OOM — while the GK sketch is
    * O(accuracy·log n) per group, partial-aggregates map-side, and
    * guarantees rank error ≤ n/accuracy (unit-tested against the exact
    * form). Use [[quantileProfile]] when the gate needs engine-exact
    * interpolated values (it remains the DuckDB-oracled query); use
    * this form for production profiling at scale. Returned values are
    * actual data elements (GK picks a member, it does not interpolate).
    */
  def quantileProfileApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr(s"approx_percentile(o_totalprice, 0.25, $accuracy)").as("p25"),
        expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(o_totalprice, 0.75, $accuracy)").as("p75"),
        expr(s"approx_percentile(o_totalprice, 0.9, $accuracy)").as("p90"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_orderpriority")

  /** Driver-gated audit of [[quantileProfileApprox]] (VERDICT r13 #4):
    * every output column is engine-reproducible — group key, exact
    * count, exact min/max, and one boolean per sketched quantile
    * asserting the GK rank guarantee (the returned value's rank
    * window [n_lt+1, n_le] intersects [(q−ε)n ± 2] — the ±2 absorbs
    * ceil-vs-floor rank conventions). The sketch VALUES are not
    * emitted (any member inside the rank window is a legal GK
    * answer — not cross-engine reproducible); the DuckDB oracle
    * states the invariant (`true`) and the hash gate fails the moment
    * the sketch breaks its bound. This exercises the exact 100 TB
    * plan: the sketch partial-aggregates map-side and the rank check
    * is one broadcast join + conditional partial sums.
    */
  def quantileProfileApproxAudit(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.9 -> "p90")
    val approx = quantileProfileApprox(spark, dir, accuracy)
      .select(col("o_orderpriority") +: qs.map(q => col(q._2)): _*)
    val eps = 1.0 / accuracy
    val counts = Tables(spark, dir).orders
      .select(col("o_orderpriority"), col("o_totalprice"))
      .join(broadcast(approx), "o_orderpriority")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (Seq(min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price")) ++
          qs.flatMap { case (_, nm) => Seq(
            sum(when(col("o_totalprice") < col(nm), 1L).otherwise(0L)).as(s"nlt_$nm"),
            sum(when(col("o_totalprice") <= col(nm), 1L).otherwise(0L)).as(s"nle_$nm"))
          }): _*)
    counts.select(
      Seq(col("o_orderpriority"), col("n_orders"),
        col("min_price"), col("max_price")) ++
        qs.map { case (q, nm) =>
          val n = col("n_orders").cast("double")
          ((col(s"nlt_$nm").cast("double") <= lit(q) * n + lit(eps) * n + lit(2.0)) &&
            (col(s"nle_$nm").cast("double") >= lit(q) * n - lit(eps) * n - lit(2.0)))
            .as(s"${nm}_ok")
        }: _*)
      .orderBy("o_orderpriority")
  }

  val quantileProfileApproxAuditSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      |  true AS p25_ok, true AS p50_ok, true AS p75_ok, true AS p90_ok
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val quantileProfileSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Typed JSON flattening of the event props payload (the staging
    * path's schema-on-read: `from_json` with an explicit schema, not
    * inference — one pass, codegen'd).
    */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("prop_k"),
        col("event_type"))
      .filter(col("prop_k").isNotNull && col("prop_k") % 2 === 0)
      .orderBy("event_id")

  /** Schema-on-read flattening via Spark 4's VARIANT type: parse the
    * JSON payload with NO declared schema (`parse_json` →
    * `variant_get`) and aggregate the extracted field — the
    * semi-structured path `json_flatten`'s from_json(DDL) cannot take
    * when the payload schema is unknown or drifting (ingest first,
    * type at query time — the lakehouse VARIANT workflow). Extraction
    * and aggregation stay exact integers.
    *
    * Scale shape: parse+extract are map-side scalar expressions
    * (VARIANT parses once per row, binary-encoded — repeated
    * variant_get probes don't re-parse); the rollup is ≤|types| rows.
    */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k").cast("long")).as("k_sum"),
        max(col("k")).as("k_max"))
      .select(col("event_type"), col("n_events"), col("k_sum"), col("k_max"),
        expr("CAST(k_sum AS DOUBLE) / CAST(n_events AS DOUBLE)").as("k_avg"))
      .orderBy("event_type")

  val variantExtractSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS k_avg
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val jsonFlattenSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
      |  event_type
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
      |  AND CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
      |ORDER BY event_id""".stripMargin

  /** Segment × year revenue matrix — relational pivot with an explicit
    * value list (explicit values keep the schema static, which is what
    * allows the one-pass pivoted aggregation).
    */
  def pivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), year(col("o_orderdate")).as("yr"),
        money(col("o_totalprice")).as("p"))
      .groupBy(col("c_mktsegment"))
      .pivot("yr", Seq("1996", "1997", "1998"))
      .agg(sum(col("p")).cast("double"))
      .withColumnsRenamed(Map("1996" -> "rev_1996", "1997" -> "rev_1997",
        "1998" -> "rev_1998"))
      .orderBy("c_mktsegment")
  }

  val pivotRevenueSql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_1996,
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_1997,
      |  CAST(sum(CASE WHEN year(o_orderdate) = 1998 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_1998
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Set operators over yearly customer cohorts: churned (EXCEPT) and
    * retained (INTERSECT) buyers, tagged and unioned.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    def cohort(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()
    val churned = cohort(1996).except(cohort(1997))
      .select(lit("bought_1996_not_1997").as("cohort"), col("o_custkey"))
    val retained = cohort(1996).intersect(cohort(1997))
      .select(lit("bought_both_years").as("cohort"), col("o_custkey"))
    churned.unionByName(retained).orderBy("cohort", "o_custkey")
  }

  val setOpsSql: String =
    """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |SELECT 'bought_1996_not_1997' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
      |UNION ALL
      |SELECT 'bought_both_years' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
      |ORDER BY cohort, o_custkey""".stripMargin

  /** As-of join: for every event, the user's most recent order at or
    * before the event time (inclusive), ties broken by max order key.
    * Spark-first implementation: union the two streams, one window
    * pass with `last(_, ignoreNulls)` over (user, time) — no
    * per-event probe join, scales as a single sort-shuffle of
    * events+orders.
    */
  def asofEventOrder(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.select(
      col("o_custkey").as("uid"),
      // o_orderdate is TIMESTAMP_NTZ; session is pinned UTC so the
      // cast to instant is lossless
      unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
      lit(0).as("is_event"),
      col("o_orderkey").as("ord_key"),
      lit(null).cast("long").as("event_id"))
    val e = t.events.select(
      col("user_id").as("uid"),
      col("ts_us"),
      lit(1).as("is_event"),
      lit(null).cast("long").as("ord_key"),
      col("event_id"))
    // orders sort before events at equal ts (inclusive as-of), and by
    // ord_key so `last` picks the max order key among equal times
    val w = Window.partitionBy("uid")
      .orderBy(col("ts_us"), col("is_event"), col("ord_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("last_order_key", last(col("ord_key"), ignoreNulls = true).over(w))
      .withColumn("last_order_ts_us",
        last(when(col("is_event") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("uid").as("user_id"),
        col("last_order_key"), col("last_order_ts_us"))
      .orderBy("event_id")
  }

  /** The SAME as-of semantics through the custom whole-operator path
    * (`graft.plans.AsOfJoin`: LogicalPlan + Strategy + sort-merge
    * exec) — gated against the identical oracle as `asofEventOrder`,
    * so the engine-extension machinery is value-checked end to end.
    * Each co-partitioned task merge-walks its (user-clustered,
    * time-sorted) event/order slices in O(n+m) with O(1) state.
    */
  def asofEventOrderCustom(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val probe = t.events.select(col("user_id").as("uid"), col("ts_us"),
      col("event_id"))
    val build = t.orders.select(col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
      col("o_orderkey"))
    graft.plans.AsOf.join(spark, probe, build)
      .select(col("event_id"), col("uid").as("user_id"),
        col("matched_key").as("last_order_key"),
        col("matched_ts").as("last_order_ts_us"))
      .orderBy("event_id")
  }

  val asofEventOrderSql: String =
    """WITH last_ts AS (
      |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ets,
      |         max(epoch_us(o.o_orderdate)) AS last_order_ts_us
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
      |  GROUP BY 1, 2, 3)
      |SELECT l.event_id, l.user_id,
      |  max(o2.o_orderkey) AS last_order_key, l.last_order_ts_us
      |FROM last_ts l LEFT JOIN orders o2
      |  ON o2.o_custkey = l.user_id AND epoch_us(o2.o_orderdate) = l.last_order_ts_us
      |GROUP BY 1, 2, 4
      |ORDER BY event_id""".stripMargin

  /** Last-touch session attribution: every order matched to the most
    * recent SESSION the customer opened at or before order time —
    * sessionize + as-of composed, and a SECOND consumer of the
    * whole-operator [[graft.plans.AsOf]] engine path (probe = orders,
    * build = per-session rows; the first is `asof_event_order_custom`
    * on raw events). Session starts are unique per user, so the
    * exec's last-row-wins tie rule reduces to the oracle's plain max.
    */
  def orderSessionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Analytics.sessionize(spark, dir)
      .select(col("user_id").as("uid"),
        col("session_start_us").as("sts"),
        col("session_seq"))
    val probe = Tables(spark, dir).orders.select(
      col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
      col("o_orderkey"))
    graft.plans.AsOf.join(spark, probe, sessions)
      .select(col("o_orderkey"), col("uid").as("user_id"),
        col("matched_key").as("session_seq"),
        col("matched_ts").as("session_start_us"))
      .orderBy("o_orderkey")
  }

  val orderSessionAttributionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |sq AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM f),
      |sess AS (
      |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |         min(ts_us) AS session_start_us
      |  FROM sq GROUP BY 1, 2),
      |last AS (
      |  SELECT o.o_orderkey, o.o_custkey AS user_id,
      |         max(s.session_start_us) AS session_start_us
      |  FROM orders o LEFT JOIN sess s
      |    ON s.user_id = o.o_custkey AND s.session_start_us <= epoch_us(o.o_orderdate)
      |  GROUP BY 1, 2)
      |SELECT l.o_orderkey, l.user_id,
      |  max(s2.session_seq) AS session_seq, l.session_start_us
      |FROM last l LEFT JOIN sess s2
      |  ON s2.user_id = l.user_id AND s2.session_start_us = l.session_start_us
      |GROUP BY 1, 2, 4
      |ORDER BY o_orderkey""".stripMargin

  /** FORWARD as-of join — earliest order at or after each event
    * (lead-time attribution: "how long until the user's next
    * purchase"), completing the as-of family beside the backward
    * `asof_event_order`. Same single union+window pass, with the scan
    * reversed: descending time order, orders sorted before events at
    * equal ts (inclusive ≥), order keys descending so `last` keeps
    * the MINIMUM key among time ties. One shuffle+sort, no per-event
    * probe join — the same scale shape as the backward form.
    */
  def asofEventOrderForward(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders.select(
      col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
      lit(0).as("is_event"),
      col("o_orderkey").as("ord_key"),
      lit(null).cast("long").as("event_id"))
    val e = t.events.select(
      col("user_id").as("uid"),
      col("ts_us"),
      lit(1).as("is_event"),
      lit(null).cast("long").as("ord_key"),
      col("event_id"))
    val w = Window.partitionBy("uid")
      .orderBy(col("ts_us").desc, col("is_event").asc, col("ord_key").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("next_order_key", last(col("ord_key"), ignoreNulls = true).over(w))
      .withColumn("next_order_ts_us",
        last(when(col("is_event") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("uid").as("user_id"),
        col("next_order_key"), col("next_order_ts_us"))
      .orderBy("event_id")
  }

  val asofEventOrderForwardSql: String =
    """WITH next_ts AS (
      |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ets,
      |         min(epoch_us(o.o_orderdate)) AS next_order_ts_us
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) >= epoch_us(e.ts)
      |  GROUP BY 1, 2, 3)
      |SELECT n.event_id, n.user_id,
      |  min(o2.o_orderkey) AS next_order_key, n.next_order_ts_us
      |FROM next_ts n LEFT JOIN orders o2
      |  ON o2.o_custkey = n.user_id AND epoch_us(o2.o_orderdate) = n.next_order_ts_us
      |GROUP BY 1, 2, 4
      |ORDER BY event_id""".stripMargin

  /** RANGE-interval window frame — the one frame type the window suite
    * didn't yet cover (running_total = unbounded rows, moving_avg =
    * bounded ROWS; this is a VALUE-bounded frame): per customer, the
    * trailing-30-day order revenue and order count as of each order.
    * The frame is `RANGE BETWEEN 29 PRECEDING AND CURRENT ROW` over
    * the epoch-day order key, so tied order dates are full peers in
    * the frame (deterministic regardless of intra-day row order —
    * exactly why a RANGE frame, not ROWS, is the correct trailing-
    * window semantics).
    *
    * Scale shape: partitioned by `o_custkey` (high cardinality, no
    * skew cliff), one shuffle+sort serves both aggregates; sums on
    * decimal(18,4) are order-independent and exact.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_day"))
      .rangeBetween(-29, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), day.as("epoch_day"),
        col("o_totalprice").cast("decimal(18,4)").as("price"))
      .select(col("o_orderkey"), col("o_custkey"), col("epoch_day"),
        sum(col("price")).over(w).cast("double").as("trailing_30d_sum"),
        count(lit(1)).over(w).cast("int").as("trailing_30d_cnt"))
      .orderBy("o_orderkey")
  }

  /** Equi-DEPTH histogram (10 equal-count buckets of order totals —
    * the quantile-binned profile beside `histogram_price`'s
    * equal-WIDTH bins): bucket boundaries adapt to the distribution,
    * so each bucket is a decile with its own [lo, hi] span.
    *
    * Scale shape: the global ntile comes from
    * [[Commerce.globalRowNumber]] (rows rank locally within
    * price-band partitions, only one-row-per-band counts take an
    * ordered window) + [[Commerce.ntileExpr]] arithmetic — a plain
    * `ntile(10) OVER (ORDER BY …)` drags the whole table through ONE
    * task's sort. The oracle states that plain window; equal by
    * construction.
    */
  def histogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders.select(col("o_orderkey"), col("o_totalprice"))
    val n = o.agg(count(lit(1)).as("__n"))
    Commerce.globalRowNumber(o, floor(col("o_totalprice") / 1000.0).cast("long"),
        Seq(col("o_totalprice"), col("o_orderkey")), "__rk")
      .crossJoin(broadcast(n))
      .select(Commerce.ntileExpr("__rk", "__n", 10).as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")
  }

  val histogramEquidepthSql: String =
    """WITH r AS (
      |  SELECT o_totalprice,
      |    CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
      |  FROM orders)
      |SELECT bucket, count(*) AS n_rows, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pearson correlation profile per return-flag class — the
    * statistical data-profiling primitive (which measures co-move?)
    * beside `histogram_price` (distribution) and `anomaly_zscore`
    * (outliers). corr(qty, price) and corr(discount, price) from the
    * five raw moments per pair.
    *
    * Determinism contract (the anomaly_zscore recipe, one level up):
    * every moment (Σx, Σx², Σxy) is an ORDER-INDEPENDENT exact
    * decimal sum; the correlation itself is then one shared SQL
    * expression ([[corrExpr]] — identical text in the Spark plan and
    * the oracle) over the double-cast moments, so each engine runs
    * the same correctly-rounded IEEE ops on the same operands in the
    * same order. One partial-aggregating scan, 3 output rows — the
    * whole query is map-side until a 3-row exchange.
    */
  def corrProfile(spark: SparkSession, dir: String): DataFrame = {
    // integer grid: quantity is integral, price/discount carry 2
    // decimals → cents. Everything downstream is scale-0 integer
    // arithmetic held in decimal(38,0) (no overflow at any SF), and
    // correlation is scale-invariant, so r over (q, cents) IS r over
    // (q, dollars).
    val li = Tables(spark, dir).lineitem.select(
      col("l_returnflag"),
      col("l_quantity").cast("decimal(18,0)").cast("long").as("q"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("p"),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("d"))
    def s38(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        s38(col("q")).as("sq"), s38(col("p")).as("sp"), s38(col("d")).as("sd"),
        s38(col("q") * col("q")).as("sqq"), s38(col("p") * col("p")).as("spp"),
        s38(col("d") * col("d")).as("sdd"),
        s38(col("q") * col("p")).as("sqp"), s38(col("d") * col("p")).as("sdp"))
      .select(col("l_returnflag"), col("n"),
        expr("CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_qty"),
        expr("CAST(sp AS DOUBLE) / CAST(n * 100 AS DOUBLE)").as("mean_price"),
        expr(corrExpr("sq", "sp", "sqq", "spp", "sqp")).as("corr_qty_price"),
        expr(corrExpr("sd", "sp", "sdd", "spp", "sdp")).as("corr_disc_price"))
      .orderBy("l_returnflag")
  }

  /** r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²)).
    * Numerator and both radicands are computed EXACTLY in scale-0
    * decimal(38,0)/int128 arithmetic and only then cast to double.
    * The scale-0 restriction is load-bearing: DuckDB converts a
    * fractional DECIMAL to double as int→double followed by a
    * power-of-ten division — TWO roundings, up to 1 ulp off Spark's
    * single correctly-rounded BigDecimal conversion, which is visible
    * after the catastrophic cancellation in n·Σxy − Σx·Σy. An
    * integer-valued decimal converts in one rounding in both engines,
    * so the doubles match bit for bit.
    */
  private def corrExpr(sx: String, sy: String, sxx: String, syy: String,
      sxy: String): String =
    s"CAST(n * $sxy - $sx * $sy AS DOUBLE)" +
      s" / (sqrt(CAST(n * $sxx - $sx * $sx AS DOUBLE))" +
      s" * sqrt(CAST(n * $syy - $sy * $sy AS DOUBLE)))"

  val corrProfileSql: String = {
    // the ONE corrExpr definition serves both engines — a second copy
    // here would invite exactly the expression drift the shared-text
    // design exists to prevent
    def corr(sx: String, sy: String, sxx: String, syy: String, sxy: String) =
      corrExpr(sx, sy, sxx, syy, sxy)
    s"""WITH g AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(q AS DECIMAL(38,0))) AS sq,
      |    sum(CAST(p AS DECIMAL(38,0))) AS sp,
      |    sum(CAST(d AS DECIMAL(38,0))) AS sd,
      |    sum(CAST(q * q AS DECIMAL(38,0))) AS sqq,
      |    sum(CAST(p * p AS DECIMAL(38,0))) AS spp,
      |    sum(CAST(d * d AS DECIMAL(38,0))) AS sdd,
      |    sum(CAST(q * p AS DECIMAL(38,0))) AS sqp,
      |    sum(CAST(d * p AS DECIMAL(38,0))) AS sdp
      |  FROM g GROUP BY 1)
      |SELECT l_returnflag, n,
      |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
      |  CAST(sp AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean_price,
      |  ${corr("sq", "sp", "sqq", "spp", "sqp")} AS corr_qty_price,
      |  ${corr("sd", "sp", "sdd", "spp", "sdp")} AS corr_disc_price
      |FROM m ORDER BY l_returnflag""".stripMargin
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_day,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_30d_sum,
      |  CAST(count(*) OVER w AS INTEGER) AS trailing_30d_cnt
      |FROM orders
      |WINDOW w AS (
      |  PARTITION BY o_custkey
      |  ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  private val AllocTotal = 1000000L // units to apportion

  /** Proportional allocation with largest-remainder rounding
    * (Hamilton's method): apportion a fixed budget of 1,000,000 units
    * across nations by revenue share such that every row gets an
    * INTEGER and the total is hit EXACTLY — the top-down allocation
    * every planning/forecast pipeline needs, where naive
    * round(T·share) drifts off the total. base = ⌊T·rev/total⌋, the
    * ≤ n leftover units go to the largest fractional remainders
    * (= largest (T·rev) mod total — pure integers, no floats
    * anywhere), nation-key tie-break. Σ alloc = T is asserted in a
    * unit test and implied by the oracle.
    *
    * Scale shape: one grouped aggregate over the joined fact, a
    * one-row total broadcast, and a rank over the GROUPS frame (rows
    * = allocation targets, never fact rows). All arithmetic exact:
    * cents in longs, and the T·rev_c product in decimal(38,0)
    * (oracle: HUGEINT) unconditionally, so no scale wraps it.
    */
  def budgetAllocate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.orders.select(col("o_custkey"), money(col("o_totalprice")).as("p"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("p")) * 100).cast("long").as("rev_c"))
    allocate(rev, AllocTotal)
      .select(col("n_name").as("nation_name"),
        (col("rev_c").cast("double") / lit(100.0)).as("revenue"),
        col("allocation"))
      .orderBy("nation_name")
  }

  /** The Hamilton-apportionment core over a (n_name, rev_c) frame —
    * exposed for the randomized property test (Σ = total and the
    * floor/floor+1 bound must hold on arbitrary weight vectors, not
    * just the corpus).
    */
  private[graft] def allocate(rev: DataFrame, total: Long): DataFrame = {
    val tot = rev.agg(sum(col("rev_c")).as("__tot"))
    val w = Window.orderBy(col("__rem").desc, col("n_name"))
    // T·rev_c in decimal(38,0) UNCONDITIONALLY (oracle: HUGEINT): the
    // bare long product wraps silently in non-ANSI Spark once
    // T·total_cents approaches 2^63 (~sf100) — wrong allocations with
    // no error. 128-bit math costs nothing here: the frame is GROUPS
    // (allocation targets), never fact rows.
    val based = rev.crossJoin(broadcast(tot))
      .withColumn("__base",
        expr(s"(CAST($total AS DECIMAL(38,0)) * rev_c) div __tot"))
      .withColumn("__rem",
        expr(s"(CAST($total AS DECIMAL(38,0)) * rev_c) % __tot"))
    val leftover = based.agg((lit(total) - sum(col("__base"))).as("__left"))
    based.crossJoin(broadcast(leftover))
      // the rank runs over the GROUPS frame (≤ allocation targets) —
      // a tiny single-task window by construction, like dim inits
      .withColumn("__rk", row_number().over(w))
      .withColumn("allocation",
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
  }

  val budgetAllocateSql: String =
    s"""WITH rev AS (
      |  SELECT n_name,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name),
      |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot FROM rev),
      |b AS (
      |  SELECT n_name, rev_c,
      |    (CAST($AllocTotal AS HUGEINT) * rev_c) // tot AS base,
      |    (CAST($AllocTotal AS HUGEINT) * rev_c) % tot AS rem
      |  FROM rev, t),
      |l AS (SELECT $AllocTotal - CAST(sum(base) AS BIGINT) AS leftover FROM b),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, n_name) AS rk FROM b)
      |SELECT n_name AS nation_name,
      |  CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
      |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END AS BIGINT)
      |    AS allocation
      |FROM r ORDER BY nation_name""".stripMargin

  private val CusumThresholdCents = 200000L // alert at 2000.00 drift

  /** CUSUM change-point monitor over daily revenue per event type —
    * the sequential statistic S_t = max_{j≤t} Σ_{i=j..t}(x_i − μ)
    * that flags a sustained shift long before any single day trips a
    * z-score. The textbook recurrence S_t = max(0, S_{t−1} + dev_t)
    * is non-associative (useless to parallelize as written); this
    * uses the identity S_t = G_t − min_{0≤j≤t} G_j (G_0 = 0) with
    * G_t = n·cum_t − t·total — a running sum and a running MIN, both
    * plain window functions. Scaling by n (instead of subtracting the
    * mean) keeps every intermediate an exact INTEGER in cents — the
    * scale-0 discipline from `corr_profile`: a fractional decimal
    * cast to double rounds twice in DuckDB and once in Spark, but
    * cent-integers convert identically, so the one division at the
    * end is the only rounding and the whole alert table hash-matches.
    *
    * Scale shape: the raw log collapses to (type, day) rows in one
    * partial-agg shuffle; every window runs over that DAYS-sized
    * frame partitioned by type — never over raw events.
    */
  def cusumAlerts(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .select(col("event_type"),
        timestamp_micros(col("ts_us")).cast("date").as("d"),
        (money(col("value")) * 100).cast("long").as("xc"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("xc")).as("xc"))
    val wCum = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy("event_type")
    daily
      .withColumn("__t", row_number().over(Window.partitionBy("event_type").orderBy("d")))
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__total", sum(col("xc")).over(wN))
      .withColumn("__cum", sum(col("xc")).over(wCum))
      .withColumn("__g", col("__cum") * col("__n") - col("__total") * col("__t"))
      // the empty prefix G_0 = 0 is a legal restart point (it is what
      // lets S_1 = max(0, x_1 − μ) fire on day one), so it joins the
      // running min alongside G_1..G_t
      .withColumn("__ming", least(lit(0L), min(col("__g")).over(wCum)))
      .withColumn("__s", col("__g") - col("__ming"))
      .select(col("event_type"), col("d").cast("string").as("day"),
        (col("xc").cast("double") / lit(100.0)).as("daily_rev"),
        (col("__s").cast("double") /
          (col("__n") * lit(100L)).cast("double")).as("cusum"),
        (col("__s") > col("__n") * CusumThresholdCents).as("alert"))
      .orderBy("event_type", "day")
  }

  val cusumAlertsSql: String =
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS xc
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, d, xc,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
      |    count(*) OVER (PARTITION BY event_type) AS n,
      |    sum(xc) OVER (PARTITION BY event_type) AS total,
      |    sum(xc) OVER (PARTITION BY event_type ORDER BY d
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM daily),
      |g AS (
      |  SELECT *, CAST(cum * n - total * t AS BIGINT) AS gt FROM w),
      |s AS (
      |  SELECT *, gt - least(0, min(gt) OVER (PARTITION BY event_type ORDER BY d
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS st
      |  FROM g)
      |SELECT event_type, CAST(d AS VARCHAR) AS day,
      |  CAST(xc AS DOUBLE) / 100.0 AS daily_rev,
      |  CAST(st AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS cusum,
      |  st > n * $CusumThresholdCents AS alert
      |FROM s ORDER BY event_type, day""".stripMargin

  private val ParetoBandCents = 100000L // 1000-currency price bands

  /** Pareto frontier (SKYLINE): the orders no other order strictly
    * dominates on (price minimized, order date maximized) — "nothing
    * both cheaper-or-equal and newer-or-equal, with one strict". The
    * multi-objective shortlist shape (cheapest-AND-freshest offers,
    * best cost/quality tradeoffs) that a WHERE clause can't express.
    *
    * The textbook single-window formulation — keep a row iff its date
    * equals the equal-price max AND beats the running date-max over
    * all STRICTLY cheaper rows — needs one GLOBAL price-ordered
    * window: a single-task sort at 100×. Here that prefix-max is
    * decomposed exactly like `Commerce.globalRowNumber`'s prefix
    * sums (max is associative too): rows take a RANGE-frame running
    * max WITHIN their price band (partitioned window on exact cents,
    * 1-preceding excludes price ties), per-band maxes (one row per
    * band) take the tiny ordered window, and the strictly-previous-
    * band offsets broadcast back — any earlier band is strictly
    * cheaper by construction, so offset ∨ local-strict-max covers
    * exactly the strict dominators. Equal (price, date) duplicate
    * rows dominate nothing and both survive, matching the oracle's
    * NOT EXISTS, which states plain pairwise dominance with no
    * window at all — two formulations, one hash.
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"),
        col("o_totalprice"),
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        (money(col("o_totalprice")) * 100).cast("long").as("xc"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("y"))
      .withColumn("__band", expr(s"xc div $ParetoBandCents"))
    val wEq = Window.partitionBy(col("xc"))
    val wLoc = Window.partitionBy(col("__band")).orderBy(col("xc"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wBand = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandPrev = o.groupBy(col("__band")).agg(max(col("y")).as("__bm"))
      .select(col("__band").as("__b2"), max(col("__bm")).over(wBand).as("__prev_band_max"))
    o.withColumn("__eq_max", max(col("y")).over(wEq))
      .withColumn("__loc_max", max(col("y")).over(wLoc))
      .join(broadcast(bandPrev), col("__band") === col("__b2"))
      .withColumn("__prev_max", greatest(
        coalesce(col("__loc_max"), lit(Long.MinValue)),
        coalesce(col("__prev_band_max"), lit(Long.MinValue))))
      .filter(col("y") === col("__eq_max") &&
        (col("__prev_max") === Long.MinValue || col("y") > col("__prev_max")))
      .select(col("o_orderkey"), col("o_totalprice"), col("order_date"))
      .orderBy("o_totalprice", "o_orderkey")
  }

  val paretoFrontierSql: String =
    """SELECT a.o_orderkey, a.o_totalprice,
      |  CAST(CAST(a.o_orderdate AS DATE) AS VARCHAR) AS order_date
      |FROM orders a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders b
      |  WHERE b.o_totalprice <= a.o_totalprice AND b.o_orderdate >= a.o_orderdate
      |    AND (b.o_totalprice < a.o_totalprice OR b.o_orderdate > a.o_orderdate))
      |ORDER BY o_totalprice, o_orderkey""".stripMargin

  // --------------------------------------------------------- growth_mom_yoy

  /** Month-over-month and year-over-year revenue growth — THE
    * top-line BI table. Monthly revenue in exact cents; MoM compares
    * to the previous calendar month (lag 1 over the month spine),
    * YoY to the same month a year earlier (lag 12 — correct because
    * the spine is dense month indices, asserted by construction of
    * yr·12+mo). Growth = exact-integer delta over exact base, one
    * division, gated on base > 0 identically in the oracle.
    *
    * Scale shape: orders reduce to the calendar-bounded month frame
    * in one partial-agg pass; both lags come from one window over
    * that frame.
    */
  def growthMomYoy(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir).orders
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
    val w = Window.orderBy("m")
    monthly
      .withColumn("prev_m", lag(col("rev_c"), 1).over(w))
      .withColumn("prev_y", lag(col("rev_c"), 12).over(w))
      .select(
        (col("m") / 12).cast("int").as("yr"),
        (col("m") % 12 + 1).cast("int").as("mo"),
        expr("CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue"),
        expr("CASE WHEN prev_m > 0 THEN CAST(rev_c - prev_m AS DOUBLE) / CAST(prev_m AS DOUBLE) END")
          .as("mom_growth"),
        expr("CASE WHEN prev_y > 0 THEN CAST(rev_c - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE) END")
          .as("yoy_growth"))
      .orderBy("yr", "mo")
  }

  val growthMomYoySql: String =
    """WITH monthly AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |l AS (
      |  SELECT *, lag(rev_c, 1) OVER (ORDER BY m) AS prev_m,
      |    lag(rev_c, 12) OVER (ORDER BY m) AS prev_y
      |  FROM monthly)
      |SELECT CAST(m // 12 AS INTEGER) AS yr, CAST(m % 12 + 1 AS INTEGER) AS mo,
      |  CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
      |  CASE WHEN prev_m > 0 THEN CAST(rev_c - prev_m AS DOUBLE) / CAST(prev_m AS DOUBLE) END
      |    AS mom_growth,
      |  CASE WHEN prev_y > 0 THEN CAST(rev_c - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE) END
      |    AS yoy_growth
      |FROM l ORDER BY yr, mo""".stripMargin

  // ------------------------------------------------------ abc_classification

  /** ABC / Pareto classification of parts by revenue: rank by
    * revenue desc, cumulative share, class A (first 80% of revenue
    * mass), B (next 15%), C (tail) — the inventory-policy primitive
    * behind `gini_profile`'s summary number. The class boundary
    * compares exact-integer cumulative cents against literal
    * thresholds scaled by the exact total — no float shares ever
    * decide a class (cum·100 vs total·80 in decimal), so the
    * classification is engine-stable even at ties.
    *
    * Scale shape: one fact pass reduces to the part dim; the rank
    * and running sum are one window over that dim frame (the
    * decile_lift boundary note applies at extreme part counts).
    */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    // ×10000, not ×100: the price·(1−discount) product carries scale
    // 4, so a cents cast is NON-integral — Spark truncates decimal→
    // long while DuckDB rounds, and the two engines disagree on the
    // .5 hundredths. Scaling by 10⁴ makes the cast exact on both.
    val rev = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey"))
      .agg((sum(money(col("l_extendedprice")) *
        (lit(1) - money(col("l_discount")))) * 10000).cast("long").as("rev_c"))
    val w = Window.orderBy(col("rev_c").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum(col("rev_c")).cast("decimal(38,0)").as("total_c"))
    rev.crossJoin(broadcast(tot))
      .withColumn("cum_c", sum(col("rev_c").cast("decimal(38,0)")).over(w))
      .select(col("l_partkey"),
        expr("CAST(rev_c AS DOUBLE) / CAST(10000 AS DOUBLE)").as("revenue"),
        expr("CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE)").as("cum_share"),
        expr("CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A' " +
          "WHEN cum_c * 100 <= total_c * 95 THEN 'B' ELSE 'C' END").as("abc_class"))
      .orderBy(col("revenue").desc, col("l_partkey"))
  }

  val abcClassificationSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(rev_c) AS DECIMAL(38,0)) AS total_c FROM rev),
      |c AS (
      |  SELECT l_partkey, rev_c, total_c,
      |    sum(CAST(rev_c AS DECIMAL(38,0))) OVER (ORDER BY rev_c DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
      |  FROM rev, t)
      |SELECT l_partkey,
      |  CAST(rev_c AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue,
      |  CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE) AS cum_share,
      |  CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A'
      |       WHEN cum_c * 100 <= total_c * 95 THEN 'B' ELSE 'C' END AS abc_class
      |FROM c ORDER BY revenue DESC, l_partkey""".stripMargin

  // ----------------------------------------------------- conversion_wilson_ci

  /** One Wilson-score fragment, shared text both engines: every
    * operand is an exact integer (k, n) so each division and the sqrt
    * are single correctly-rounded IEEE ops — sqrt is exactly rounded
    * per IEEE-754, safe in shared expressions (the welch_t_test
    * rule). z = 1.96 as a short exact literal.
    */
  private def wilsonExpr(sign: String): String = {
    val ph = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    val nd = "CAST(n AS DOUBLE)"
    val zz = "(1.96 * 1.96)"
    s"(($ph + $zz / (2.0 * $nd)) $sign 1.96 * sqrt(($ph * (1.0 - $ph)" +
      s" + $zz / (4.0 * $nd * $nd)) / $nd)) / (1.0 + $zz / $nd)"
  }

  /** Wilson-score 95% confidence interval on the share of customers
    * per market segment who ever ordered — the interval that stays
    * inside [0,1] and behaves at small n where the normal
    * approximation fails (the A/B-readout primitive
    * `ab_test_conversion` reports point estimates for). k and n are
    * exact semi-join counts; the interval is pure shared-text IEEE
    * arithmetic on them.
    *
    * Scale shape: one distinct-custkey pass over orders (partial
    * aggregate), broadcast-joined flag onto customers, ≤|segments|
    * output rows. No window, no sort.
    */
  def conversionWilsonCi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val buyers = t.orders.select(col("o_custkey")).distinct()
      .withColumn("bought", lit(1L))
    t.customer
      .join(buyers, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("bought"), lit(0L))).as("k"))
      .select(col("c_mktsegment"), col("n"), col("k"),
        expr("CAST(k AS DOUBLE) / CAST(n AS DOUBLE)").as("p_hat"),
        expr(wilsonExpr("-")).as("ci_lo"),
        expr(wilsonExpr("+")).as("ci_hi"))
      .orderBy("c_mktsegment")
  }

  val conversionWilsonCiSql: String =
    s"""WITH buyers AS (SELECT DISTINCT o_custkey, 1 AS bought FROM orders),
      |g AS (
      |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(coalesce(bought, 0)) AS BIGINT) AS k
      |  FROM customer LEFT JOIN buyers ON c_custkey = o_custkey
      |  GROUP BY 1)
      |SELECT c_mktsegment, n, k,
      |  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
      |  ${wilsonExpr("-")} AS ci_lo,
      |  ${wilsonExpr("+")} AS ci_hi
      |FROM g ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------- daily_revenue_gapfill

  /** Dense-spine gap fill: daily revenue joined onto the FULL day
    * spine between the data's min and max dates, zero-filled with an
    * explicit was_missing flag — the densification every time-series
    * consumer (EWMA, seasonal index, forecasting) silently assumes
    * and `fill_forward` (carry last OBSERVATION) does not provide.
    * Spine via sequence/explode of integer epoch days (generate_series
    * in the oracle) — exact, engine-stable.
    *
    * Scale shape: the spine generates map-side from one scalar
    * min/max aggregate (the dim_date pattern); daily revenue
    * partial-aggregates; the spine join is broadcast (a day spine is
    * tiny at any SF — time grows slowly).
    */
  def dailyRevenueGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).orders
      .groupBy(expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)").as("d"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
    val spine = Tables(spark, dir).orders
      .agg(expr("CAST(datediff(min(o_orderdate), DATE '1970-01-01') AS BIGINT)").as("lo"),
        expr("CAST(datediff(max(o_orderdate), DATE '1970-01-01') AS BIGINT)").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("d"))
    spine.join(daily, Seq("d"), "left")
      .select(
        expr("CAST(date_add(DATE '1970-01-01', CAST(d AS INT)) AS STRING)").as("day"),
        expr("CAST(coalesce(rev_c, 0) AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue"),
        when(col("rev_c").isNull, 1L).otherwise(0L).as("was_missing"))
      .orderBy("day")
  }

  val dailyRevenueGapfillSql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |bounds AS (
      |  SELECT CAST(min(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS lo,
      |    CAST(max(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS hi
      |  FROM orders),
      |spine AS (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds)
      |SELECT CAST(DATE '1970-01-01' + CAST(spine.d AS INTEGER) AS VARCHAR) AS day,
      |  CAST(coalesce(rev_c, 0) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
      |  CAST(CASE WHEN rev_c IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_missing
      |FROM spine LEFT JOIN daily ON spine.d = daily.d
      |ORDER BY day""".stripMargin

  // -------------------------------------------------- quantile_bands_monthly

  /** Monthly order-value quantile bands (P25/P50/P75 + count) — the
    * distribution-over-time view a drift dashboard plots where
    * `quantile_profile` gives one static cut (is the typical order
    * growing, or just the tail?). Same engine-exact interpolated
    * percentile + rounded-4 parity convention; exact `percentile`
    * buffers a month's orders per group — the 100-TB path is the
    * coded GK sibling [[quantileBandsMonthlyApprox]].
    */
  def quantileBandsMonthly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("yyyymm"))
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
      .orderBy("yyyymm")

  val quantileBandsMonthlySql: String =
    """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS yyyymm,
      |  count(*) AS n_orders,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY 1 ORDER BY yyyymm""".stripMargin

  /** Scale path for [[quantileBandsMonthly]] (VERDICT r9 #1): the
    * per-month quartile bands via the GK sketch — a month of orders
    * at 100 TB is billions of rows in ONE group under exact
    * `percentile` (a single-buffer OOM); the sketch
    * partial-aggregates map-side at O(accuracy·log n) per month and
    * returns actual order totals (rank error ≤ n/accuracy,
    * rank-error-tested). The exact form remains the hash-gated entry.
    */
  def quantileBandsMonthlyApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables(spark, dir).orders
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("yyyymm"))
      .agg(count(lit(1)).as("n_orders"),
        expr(s"approx_percentile(o_totalprice, 0.25, $accuracy)").as("p25"),
        expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)").as("p50"),
        expr(s"approx_percentile(o_totalprice, 0.75, $accuracy)").as("p75"))
      .orderBy("yyyymm")

  // ------------------------------------------------ revenue_contribution_mom

  /** "Why did the metric move": every month's total revenue delta
    * decomposed into per-region contributions (Δtotal = Σ Δregion by
    * construction — test-pinned), with each region's share of the
    * move. Deltas are exact cents; the share is ONE division gated on
    * Δtotal ≠ 0 identically on both engines (sign-safe: share of a
    * negative move is meaningful, near-zero totals produce no share
    * rather than a wild ratio).
    *
    * Scale shape: one region-month partial aggregate (dims
    * broadcast), lag within region, a month-level rollup joined back
    * by broadcast — all grids bounded by the slow time axis.
    */
  def revenueContributionMom(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val monthly = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
    val withDelta = monthly
      .withColumn("delta_c", col("rev_c") - lag(col("rev_c"), 1).over(
        Window.partitionBy("region_name").orderBy("m")))
      .filter(col("delta_c").isNotNull)
    val totals = withDelta.groupBy(col("m").as("tm"))
      .agg(sum(col("delta_c")).as("total_delta_c"))
    withDelta.join(broadcast(totals), col("m") === col("tm"))
      .select(
        (col("m") / 12).cast("int").as("yr"), (col("m") % 12 + 1).cast("int").as("mo"),
        col("region_name"),
        expr("CAST(delta_c AS DOUBLE) / CAST(100 AS DOUBLE)").as("region_delta"),
        expr("CAST(total_delta_c AS DOUBLE) / CAST(100 AS DOUBLE)").as("total_delta"),
        expr("CASE WHEN total_delta_c <> 0 THEN CAST(delta_c AS DOUBLE) / CAST(total_delta_c AS DOUBLE) END")
          .as("contribution"))
      .orderBy("yr", "mo", "region_name")
  }

  val revenueContributionMomSql: String =
    """WITH monthly AS (
      |  SELECT r_name AS region_name,
      |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT *, rev_c - lag(rev_c) OVER (PARTITION BY region_name ORDER BY m) AS delta_c
      |  FROM monthly),
      |f AS (SELECT * FROM d WHERE delta_c IS NOT NULL),
      |t AS (SELECT m AS tm, sum(delta_c) AS total_delta_c FROM f GROUP BY 1)
      |SELECT CAST(m // 12 AS INTEGER) AS yr, CAST(m % 12 + 1 AS INTEGER) AS mo,
      |  region_name,
      |  CAST(delta_c AS DOUBLE) / CAST(100 AS DOUBLE) AS region_delta,
      |  CAST(total_delta_c AS DOUBLE) / CAST(100 AS DOUBLE) AS total_delta,
      |  CASE WHEN total_delta_c <> 0
      |    THEN CAST(delta_c AS DOUBLE) / CAST(total_delta_c AS DOUBLE) END AS contribution
      |FROM f JOIN t ON m = tm
      |ORDER BY yr, mo, region_name""".stripMargin

  // ------------------------------------------------------- segment_migration

  /** Customer value-segment migration: revenue quartile (ntile 4,
    * custkey tiebreak) in the data's FIRST half vs the SECOND half,
    * as a transition-count matrix with exact row shares — the
    * `markov_transitions` idea at customer-lifetime grain (who moves
    * up, who churns out; quartile 0 = absent that half). The halves
    * split on the integer midpoint day, the `tv_distance_drift`
    * convention.
    *
    * Scale shape: two half-period revenue aggregates from one scan
    * (conditional sums), two DISTRIBUTED quartile ranks over the
    * customer dim (the rfm_segment two-level prefix sum — banded
    * local windows + broadcast bucket offsets, no unpartitioned
    * window ever touches the customer frame), and a ≤25-cell rollup.
    */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    segmentPairFrame(spark, dir)
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("row_total", sum(col("n_customers")).over(
        Window.partitionBy("seg_a")))
      .select(col("seg_a"), col("seg_b"), col("n_customers"),
        expr("CAST(n_customers AS DOUBLE) / CAST(row_total AS DOUBLE)").as("share"))
      .orderBy("seg_a", "seg_b")
  }

  /** The per-customer (seg_a, seg_b) quartile pair behind
    * [[segmentMigration]] — split out so `bowker_test` (Stats) reads
    * the IDENTICAL segment definition for its marginal-homogeneity
    * statistic.
    */
  private[operators] def segmentPairFrame(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val mid = t.orders.agg(expr(
      "CAST(floor((min(datediff(o_orderdate, DATE '1970-01-01')) + max(datediff(o_orderdate, DATE '1970-01-01'))) / 2.0) AS BIGINT)").as("mid"))
    val per = t.orders.crossJoin(broadcast(mid))
      .groupBy(col("o_custkey"))
      .agg(
        (sum(when(expr("datediff(o_orderdate, DATE '1970-01-01') <= mid"),
          money(col("o_totalprice"))).otherwise(expr("CAST(0 AS DECIMAL(18,2))"))) * 100)
          .cast("long").as("rev_a"),
        (sum(when(expr("datediff(o_orderdate, DATE '1970-01-01') > mid"),
          money(col("o_totalprice"))).otherwise(expr("CAST(0 AS DECIMAL(18,2))"))) * 100)
          .cast("long").as("rev_b"))
    // The oracle's ntile(4) OVER (PARTITION BY rev=0 ORDER BY rev,
    // custkey) discards the zero partition's tile — so only the
    // NON-zero class needs a rank, and that rank is the rfm_segment
    // two-level prefix sum (cents banded at the MonetaryBucketWidth
    // convention), never an unpartitioned window over the customer
    // frame. per is cached: it feeds both class filters + the join
    // spine (one orders scan total; released by the harness).
    val perC = graft.core.OwnedCaches.own(per.cache())
    val bandC = (Commerce.MonetaryBucketWidth * 100).toLong
    def segCol(rev: String, out: String): DataFrame = {
      val nz = perC.filter(col(rev) =!= 0L).select(col("o_custkey"), col(rev))
      val n = nz.agg(count(lit(1)).as("__n"))
      Commerce.globalRowNumber(nz, floor(col(rev) / bandC),
          Seq(col(rev), col("o_custkey")), "__rk")
        .crossJoin(broadcast(n))
        .select(col("o_custkey"),
          Commerce.ntileExpr("__rk", "__n", 4).cast("int").as(out))
    }
    perC
      .join(segCol("rev_a", "seg_a"), Seq("o_custkey"), "left")
      .join(segCol("rev_b", "seg_b"), Seq("o_custkey"), "left")
      .select(coalesce(col("seg_a"), lit(0)).as("seg_a"),
        coalesce(col("seg_b"), lit(0)).as("seg_b"))
  }

  /** The seg CTE chain shared verbatim by [[segmentMigrationSql]] and
    * Stats.bowkerTestSql — one definition, two oracle faces.
    */
  private[operators] val segmentPairSqlCtes: String =
    """mid AS (
      |  SELECT CAST(floor((min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |    + max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')) / 2.0) AS BIGINT) AS mid
      |  FROM orders),
      |per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) - DATE '1970-01-01' <= mid
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS rev_a,
      |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) - DATE '1970-01-01' > mid
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS rev_b
      |  FROM orders, mid GROUP BY 1),
      |seg AS (
      |  SELECT o_custkey,
      |    CASE WHEN rev_a = 0 THEN 0 ELSE ntile(4) OVER
      |      (PARTITION BY rev_a = 0 ORDER BY rev_a, o_custkey) END AS seg_a,
      |    CASE WHEN rev_b = 0 THEN 0 ELSE ntile(4) OVER
      |      (PARTITION BY rev_b = 0 ORDER BY rev_b, o_custkey) END AS seg_b
      |  FROM per)""".stripMargin

  val segmentMigrationSql: String =
    s"""WITH $segmentPairSqlCtes,
       |m AS (
       |  SELECT seg_a, seg_b, count(*) AS n_customers FROM seg GROUP BY 1, 2)
       |SELECT CAST(seg_a AS INTEGER) AS seg_a, CAST(seg_b AS INTEGER) AS seg_b,
       |  CAST(n_customers AS BIGINT) AS n_customers,
       |  CAST(n_customers AS DOUBLE)
       |    / CAST(sum(n_customers) OVER (PARTITION BY seg_a) AS DOUBLE) AS share
       |FROM m ORDER BY seg_a, seg_b""".stripMargin

  // ------------------------------------------------------ trailing_spend_90d

  /** Point-in-time-correct trailing feature: for every event, the
    * user's order spend in the 90 days strictly BEFORE the event —
    * the leakage-safe feature join a training pipeline must get right
    * (a feature computed with post-label data poisons the model; the
    * as-of family gives the latest row, this gives the trailing
    * AGGREGATE). Band: event_day − 90 ≤ order_day < event_day — all
    * integer day arithmetic; spend exact decimal cents; events with
    * no qualifying orders keep 0 (left join + coalesce on BOTH
    * engines).
    *
    * Scale shape: equi-join on the user key carries the band as a
    * post-join filter — candidate volume is Σ events·orders per user.
    * At 100 TB: add the event MONTH to the key (each 90-day band
    * spans ≤4 month buckets, orders replicate ×4) — the standard
    * band-join bucketing; the per-event aggregation partial-reduces
    * on (event_id) co-partitioned with the join.
    */
  def trailingSpend90d(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("event_id"), col("user_id"),
      expr("CAST(ts_us div 86400000000 AS BIGINT)").as("eday"))
    val ord = t.orders.select(col("o_custkey"),
      expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)").as("oday"),
      (money(col("o_totalprice")) * 100).cast("long").as("spend_c"))
    ev.join(ord, col("user_id") === col("o_custkey")
        && col("oday") >= col("eday") - 90 && col("oday") < col("eday"), "left")
      .groupBy(col("event_id"), col("user_id"), col("eday"))
      .agg(coalesce(sum(col("spend_c")), lit(0L)).as("sc"),
        sum(when(col("oday").isNotNull, 1L).otherwise(0L)).as("n_orders"))
      .select(col("event_id"), col("user_id"),
        col("n_orders"),
        expr("CAST(sc AS DOUBLE) / CAST(100 AS DOUBLE)").as("spend_90d"))
      .orderBy("event_id")
  }

  val trailingSpend90dSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS eday
      |  FROM events),
      |ord AS (
      |  SELECT o_custkey,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS oday,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS spend_c
      |  FROM orders)
      |SELECT event_id, user_id,
      |  CAST(sum(CASE WHEN oday IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
      |  CAST(coalesce(sum(spend_c), 0) AS DOUBLE) / CAST(100 AS DOUBLE) AS spend_90d
      |FROM ev LEFT JOIN ord
      |  ON user_id = o_custkey AND oday >= eday - 90 AND oday < eday
      |GROUP BY event_id, user_id, eday
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------ open_order_backlog

  /** Daily order-line backlog: cumulative lines placed (by order
    * date) minus cumulative lines shipped (by ship date) — the
    * operations work-in-progress curve (`q12_late_lines` counts the
    * failures; this shows the queue they came from). The two daily
    * series union into one day spine and a single cumulative window
    * produces the balance — all exact integers.
    *
    * Scale shape: both daily series partial-aggregate map-side to
    * the bounded day grid; the union and the cumulative window run
    * on grid-sized frames (≤ a few thousand rows at any SF).
    */
  def openOrderBacklog(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val placed = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("placed"))
      .withColumn("shipped", lit(0L))
    val shipped = t.lineitem
      .groupBy(col("l_shipdate").cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("shipped"))
      .withColumn("placed", lit(0L))
    placed.unionByName(shipped)
      .groupBy(col("day"))
      .agg(sum(col("placed")).as("placed"), sum(col("shipped")).as("shipped"))
      .withColumn("backlog", sum(col("placed") - col("shipped")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  val openOrderBacklogSql: String =
    """WITH placed AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
      |    count(*) AS placed, 0 AS shipped
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |shipped AS (
      |  SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS day,
      |    0 AS placed, count(*) AS shipped
      |  FROM lineitem GROUP BY 1),
      |g AS (
      |  SELECT day, CAST(sum(placed) AS BIGINT) AS placed,
      |    CAST(sum(shipped) AS BIGINT) AS shipped
      |  FROM (SELECT * FROM placed UNION ALL SELECT * FROM shipped)
      |  GROUP BY day)
      |SELECT day, placed, shipped,
      |  CAST(sum(placed - shipped) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
      |FROM g ORDER BY day""".stripMargin

  // ------------------------------------------------------- hhi_concentration

  /** Herfindahl–Hirschman supplier-concentration index per region:
    * Σ share² over supplier revenue shares — the antitrust/market-
    * structure number beside `gini_profile`'s inequality and
    * `lorenz_curve`'s distribution. Share squares are the one place
    * exact integers explode past int128 comfort (Σ rev_c² ≈ 10¹⁹ at
    * sf0.01), so the discipline flips: each share is ONE exact-operand
    * double divide ROUNDED to 9 dp (round-half-up on positive doubles
    * agrees across engines — the rounded-4 percentile convention),
    * squared and summed EXACTLY in decimal, and the final rescale is an
    * EXPLICIT round(·, 10) before the scale-10 cast — DuckDB's
    * decimal→decimal downscale cast TRUNCATES where Spark's rounds
    * (the inverse of the abc_classification decimal→bigint lesson) —
    * keeping the decimal→double cast in single-rounding range
    * (< 2^53 internal units). Order-independent by construction.
    *
    * Scale shape: one partial-agg pass to (region, supplier) revenue
    * (nation/region broadcast), a per-region total, and a ≤|regions|
    * rollup — no window over raw rows, no sort.
    */
  def hhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bySupp = t.lineitem
      .join(t.supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("s_suppkey"))
      .agg((sum(money(col("l_extendedprice"))) * 100).cast("long").as("rev_c"))
    bySupp
      .withColumn("total_c", sum(col("rev_c")).over(
        Window.partitionBy("region_name")))
      .withColumn("sq", expr(
        "CAST(round(CAST(rev_c AS DOUBLE) / CAST(total_c AS DOUBLE), 9) AS DECIMAL(11,9))"))
      .groupBy(col("region_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        expr("CAST(CAST(round(sum(sq * sq), 10) AS DECIMAL(12,10)) AS DOUBLE)").as("hhi"))
      .orderBy("region_name")
  }

  val hhiConcentrationSql: String =
    """WITH bys AS (
      |  SELECT r_name AS region_name, s_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |sh AS (
      |  SELECT *,
      |    CAST(round(CAST(rev_c AS DOUBLE) / CAST(sum(rev_c) OVER (PARTITION BY region_name) AS DOUBLE), 9) AS DECIMAL(11,9)) AS sq
      |  FROM bys)
      |SELECT region_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(CAST(round(sum(sq * sq), 10) AS DECIMAL(12,10)) AS DOUBLE) AS hhi
      |FROM sh GROUP BY region_name ORDER BY region_name""".stripMargin

  // ------------------------------------------------------- max_revenue_streak

  /** Best consecutive-day revenue stretch vs the period average —
    * Kadane's max-subarray run entirely in SQL windows: daily excess
    * score = rev_c·D − total_c (exact integers, D = #days — scaling
    * by D avoids a fractional mean), prefix sums, and best-ending-
    * here = cum − min(0, min prefix before). The argmax end day is
    * the earliest best; the streak start is recovered by matching the
    * prefix value (latest matching prefix < end ⇒ the shortest such
    * streak) — every choice an integer comparison, engine-stable.
    * Output value = best/(D·100): cumulative dollars ABOVE average
    * revenue over the streak.
    *
    * Scale shape: the day grid is bounded (≤ a few thousand rows at
    * any SF — the time dimension grows slowly); the raw scan partial-
    * aggregates to it, and all windows run on the grid in one task.
    * Products rev_c·D stay < 2^53 to ~sf30.
    */
  def maxRevenueStreak(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).orders
      .groupBy(expr("datediff(o_orderdate, DATE '1970-01-01')").as("d"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
    val base = daily
      .withColumn("nd", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total_c", sum(col("rev_c")).over(Window.partitionBy()))
      .withColumn("score", col("rev_c") * col("nd") - col("total_c"))
      .withColumn("rn", row_number().over(Window.orderBy("d")))
      .withColumn("cum", sum(col("score")).over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val scored = base
      .withColumn("mp", least(coalesce(min(col("cum")).over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)), lit(0L)))
      .withColumn("best_here", col("cum") - col("mp"))
      .withColumn("best", max(col("cum") - col("mp")).over(Window.partitionBy()))
    val end = scored.filter(col("best_here") === col("best"))
      .orderBy("rn").limit(1)
      .select(col("rn").as("end_rn"), col("d").as("end_d"),
        (col("cum") - col("best")).as("pt"), col("best"), col("nd"))
    val start = end.join(scored.select(col("rn").as("prn"), col("cum").as("pcum"),
        col("d").as("pd")),
        col("pcum") === col("pt") && col("prn") < col("end_rn"), "left")
      .groupBy(col("end_rn"), col("end_d"), col("best"), col("nd"))
      .agg(max(col("prn")).as("best_prn"))
    start
      .join(scored.select(col("rn"), col("d").as("sd")),
        col("rn") === coalesce(col("best_prn") + 1, lit(1)))
      .select(
        expr("CAST(date_add(DATE '1970-01-01', CAST(sd AS INT)) AS STRING)").as("start_day"),
        expr("CAST(date_add(DATE '1970-01-01', CAST(end_d AS INT)) AS STRING)").as("end_day"),
        (col("end_rn") - coalesce(col("best_prn"), lit(0L))).cast("long").as("streak_days"),
        expr("CAST(best AS DOUBLE) / CAST(nd * 100 AS DOUBLE)").as("excess_revenue"))
  }

  val maxRevenueStreakSql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT d, rev_c,
      |    count(*) OVER () AS nd, sum(rev_c) OVER () AS total_c,
      |    row_number() OVER (ORDER BY d) AS rn
      |  FROM daily),
      |c AS (
      |  SELECT *, rev_c * nd - total_c AS score FROM base),
      |cc AS (
      |  SELECT *, sum(score) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM c),
      |scored AS MATERIALIZED (
      |  SELECT *,
      |    least(coalesce(min(cum) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0) AS mp
      |  FROM cc),
      |b AS (
      |  SELECT *, cum - mp AS best_here, max(cum - mp) OVER () AS best
      |  FROM scored),
      |e AS (
      |  SELECT rn AS end_rn, d AS end_d, cum - best AS pt, best, nd
      |  FROM b WHERE best_here = best ORDER BY rn LIMIT 1),
      |s AS (
      |  SELECT e.end_rn, e.end_d, e.best, e.nd, max(p.rn) AS best_prn
      |  FROM e LEFT JOIN scored p ON p.cum = e.pt AND p.rn < e.end_rn
      |  GROUP BY 1, 2, 3, 4)
      |SELECT
      |  CAST(DATE '1970-01-01' + CAST(g.d AS INTEGER) AS VARCHAR) AS start_day,
      |  CAST(DATE '1970-01-01' + CAST(s.end_d AS INTEGER) AS VARCHAR) AS end_day,
      |  CAST(s.end_rn - coalesce(s.best_prn, 0) AS BIGINT) AS streak_days,
      |  CAST(s.best AS DOUBLE) / CAST(s.nd * 100 AS DOUBLE) AS excess_revenue
      |FROM s JOIN scored g ON g.rn = coalesce(s.best_prn + 1, 1)""".stripMargin

  // ------------------------------------------------------------ lorenz_curve

  /** Lorenz curve of customer revenue concentration: customers in
    * ascending-revenue deciles (ntile with custkey tiebreak — both
    * engines implement the SQL-standard first-buckets-get-the-extra
    * rule, the `ntile_buckets` parity precedent), cumulative revenue
    * share per decile — the curve whose area `gini_profile` summarizes
    * to one number. Cents accumulate exactly; the share is ONE
    * integer-over-integer divide.
    *
    * Scale shape: per-customer revenue partial-aggregates; the decile
    * rank is the rfm_segment two-level prefix sum (banded local
    * windows + broadcast bucket offsets — no single-task window over
    * the customer frame at any scale); the decile rollup is 10 rows.
    */
  def lorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // cached: the decile rank AND the row-count scalar read this
    // customer-grain frame (one orders scan; released by the harness)
    val byCust = graft.core.OwnedCaches.own(t.orders
      .groupBy(col("o_custkey"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
      .cache())
    // distributed ntile(10): rfm_segment's two-level prefix-sum rank
    // (cents banded at the MonetaryBucketWidth convention) + the
    // SQL-standard tile arithmetic — equal to the oracle's global
    // ntile by construction, with no single-task customer sort
    val n = byCust.agg(count(lit(1)).as("__n"))
    val bandC = (Commerce.MonetaryBucketWidth * 100).toLong
    val ranked = Commerce.globalRowNumber(byCust, floor(col("rev_c") / bandC),
        Seq(col("rev_c"), col("o_custkey")), "__rk")
      .crossJoin(broadcast(n))
      .withColumn("decile", Commerce.ntileExpr("__rk", "__n", 10).cast("int"))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("dec_c"))
      .withColumn("cum_c", sum(col("dec_c")).over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_c", sum(col("dec_c")).over(Window.partitionBy()))
      .select(col("decile"), col("n_customers"),
        expr("CAST(dec_c AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue"),
        expr("CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE)").as("cum_share"))
      .orderBy("decile")
  }

  val lorenzCurveSql: String =
    """WITH byc AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT *, ntile(10) OVER (ORDER BY rev_c, o_custkey) AS decile
      |  FROM byc),
      |d AS (
      |  SELECT decile, count(*) AS n_customers, sum(rev_c) AS dec_c
      |  FROM r GROUP BY 1),
      |c AS (
      |  SELECT *,
      |    sum(dec_c) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
      |    sum(dec_c) OVER () AS total_c
      |  FROM d)
      |SELECT CAST(decile AS INTEGER) AS decile, CAST(n_customers AS BIGINT) AS n_customers,
      |  CAST(dec_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
      |  CAST(cum_c AS DOUBLE) / CAST(total_c AS DOUBLE) AS cum_share
      |FROM c ORDER BY decile""".stripMargin

  // -------------------------------------------------------- new_vs_returning

  /** Daily active users split NEW vs RETURNING (first-seen day vs
    * any later day) — the growth-accounting table every DAU chart
    * decomposes into. First-seen is a user-grain min; the split is
    * one comparison; shares are exact divisions.
    *
    * Scale shape: the user-day frame (the engagement ops' shuffle
    * grain) joins its user-grain first-seen side on the SAME user
    * key — co-partitioned, then reduces to the calendar-bounded day
    * frame.
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables(spark, dir).events
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).cast("date").as("d"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
    ud.join(first, "user_id")
      .groupBy(col("d"))
      .agg(sum(when(col("d") === col("first_d"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("d") =!= col("first_d"), 1L).otherwise(0L)).as("returning_users"))
      .select(col("d").cast("string").as("day"), col("new_users"),
        col("returning_users"),
        expr("CAST(new_users AS DOUBLE) / CAST(new_users + returning_users AS DOUBLE)")
          .as("new_share"))
      .orderBy("day")
  }

  val newVsReturningSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |f AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY 1),
      |g AS (
      |  SELECT ud.d,
      |    CAST(sum(CASE WHEN ud.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
      |    CAST(sum(CASE WHEN ud.d <> f.first_d THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
      |  FROM ud JOIN f ON f.user_id = ud.user_id
      |  GROUP BY ud.d)
      |SELECT CAST(d AS VARCHAR) AS day, new_users, returning_users,
      |  CAST(new_users AS DOUBLE) / CAST(new_users + returning_users AS DOUBLE) AS new_share
      |FROM g ORDER BY day""".stripMargin

  // -------------------------------------------------------- price_volume_mix

  /** Price–volume decomposition of the revenue delta between the
    * data's two halves, per region: Δrev = price effect
    * ((p₂−p₁)·q₁, at OLD volume) + volume effect (p₂·(q₂−q₁)) — the
    * Laspeyres/Paasche split an FP&A variance bridge runs. Unit
    * price per half = exact cents/quantity rationals; every effect is
    * a fixed expression over the four exact aggregates (cents, qty
    * per half), so the bridge reconciles EXACTLY: price + volume =
    * Δrev (test-pinned).
    *
    * Scale shape: one fact pass with a half indicator → per-(region,
    * half) partial aggregates (2·|regions| rows); the decomposition
    * is arithmetic on that tiny frame.
    */
  def priceVolumeMix(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dated = t.lineitem.select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("decimal(18,0)").cast("long").as("q"),
        (money(col("l_extendedprice")) * 100).cast("long").as("p_c"),
        col("l_shipdate").cast("date").as("sd"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
    val mid = dated.agg(min(col("sd")).as("lo"), max(col("sd")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) / 2 AS INT))").as("mid"))
    val halves = dated.crossJoin(broadcast(mid))
      .groupBy(col("r_name"))
      .agg(
        sum(when(col("sd") < col("mid"), col("p_c")).otherwise(0L)).as("rev1"),
        sum(when(col("sd") < col("mid"), col("q")).otherwise(0L)).as("qty1"),
        sum(when(col("sd") >= col("mid"), col("p_c")).otherwise(0L)).as("rev2"),
        sum(when(col("sd") >= col("mid"), col("q")).otherwise(0L)).as("qty2"))
    halves.select(col("r_name").as("region"),
        expr("CAST(rev1 AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue_h1"),
        expr("CAST(rev2 AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue_h2"),
        expr("CAST(rev2 - rev1 AS DOUBLE) / CAST(100 AS DOUBLE)").as("delta_rev"),
        // price effect at old volume: (p2 - p1)·q1 = rev2·q1/q2 - rev1
        expr("(CAST(rev2 AS DOUBLE) / CAST(qty2 AS DOUBLE)" +
          " - CAST(rev1 AS DOUBLE) / CAST(qty1 AS DOUBLE))" +
          " * CAST(qty1 AS DOUBLE) / CAST(100 AS DOUBLE)").as("price_effect"),
        // volume effect at new price: p2·(q2 - q1)
        expr("CAST(rev2 AS DOUBLE) / CAST(qty2 AS DOUBLE)" +
          " * CAST(qty2 - qty1 AS DOUBLE) / CAST(100 AS DOUBLE)").as("volume_effect"))
      .orderBy("region")
  }

  val priceVolumeMixSql: String =
    """WITH d AS (
      |  SELECT r_name,
      |    CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_c,
      |    CAST(l_shipdate AS DATE) AS sd
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |m AS (SELECT min(sd) + CAST((max(sd) - min(sd)) // 2 AS INTEGER) AS mid FROM d),
      |h AS (
      |  SELECT r_name,
      |    CAST(sum(CASE WHEN sd < (SELECT mid FROM m) THEN p_c ELSE 0 END) AS BIGINT) AS rev1,
      |    CAST(sum(CASE WHEN sd < (SELECT mid FROM m) THEN q ELSE 0 END) AS BIGINT) AS qty1,
      |    CAST(sum(CASE WHEN sd >= (SELECT mid FROM m) THEN p_c ELSE 0 END) AS BIGINT) AS rev2,
      |    CAST(sum(CASE WHEN sd >= (SELECT mid FROM m) THEN q ELSE 0 END) AS BIGINT) AS qty2
      |  FROM d GROUP BY 1)
      |SELECT r_name AS region,
      |  CAST(rev1 AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue_h1,
      |  CAST(rev2 AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue_h2,
      |  CAST(rev2 - rev1 AS DOUBLE) / CAST(100 AS DOUBLE) AS delta_rev,
      |  (CAST(rev2 AS DOUBLE) / CAST(qty2 AS DOUBLE)
      |    - CAST(rev1 AS DOUBLE) / CAST(qty1 AS DOUBLE))
      |    * CAST(qty1 AS DOUBLE) / CAST(100 AS DOUBLE) AS price_effect,
      |  CAST(rev2 AS DOUBLE) / CAST(qty2 AS DOUBLE)
      |    * CAST(qty2 - qty1 AS DOUBLE) / CAST(100 AS DOUBLE) AS volume_effect
      |FROM h ORDER BY region""".stripMargin

  // --------------------------------------------------------- supplier_scorecard

  /** One-row-per-supplier vendor scorecard: volume, revenue and its
    * share, return rate, and mean order→ship latency — the four
    * metrics procurement reviews together (each exists as its own
    * deep-dive operator: `ship_lag_profile` for the latency
    * distribution, `q10_returns` for the revenue at risk; this is the
    * management face). Revenue exact cents; every rate ONE division
    * of exact sums.
    *
    * Scale shape: one lineitem⋈orders shuffle on orderkey (dates +
    * flags projected narrow), supplier-grain partial agg, supplier
    * dim broadcast for names, one scalar total broadcast back.
    */
  def supplierScorecard(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val lines = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (money(col("l_extendedprice")) * 100).cast("long").as("rev_c"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"),
        col("l_shipdate").cast("date").as("ship_d"))
      .join(t.orders.select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_d")),
        col("l_orderkey") === col("o_orderkey"))
    val per = lines.groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("rev_c")).as("rev_c"),
        sum(col("ret")).as("n_returned"),
        sum(datediff(col("ship_d"), col("order_d")).cast("long")).as("lag_sum"))
    val tot = per.agg(sum(col("rev_c")).as("rev_total"))
    per.crossJoin(broadcast(tot))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("suppkey") === col("s_suppkey"))
      .select(col("suppkey"), col("s_name").as("supplier_name"), col("n_lines"),
        expr("CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE)").as("revenue"),
        expr("CAST(rev_c AS DOUBLE) / CAST(rev_total AS DOUBLE)").as("revenue_share"),
        expr("CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)").as("return_rate"),
        expr("CAST(lag_sum AS DOUBLE) / CAST(n_lines AS DOUBLE)").as("mean_lag_days"))
      .orderBy("suppkey")
  }

  val supplierScorecardSql: String =
    """WITH lines AS (
      |  SELECT l.l_suppkey AS suppkey,
      |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c,
      |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
      |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lag
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |per AS (
      |  SELECT suppkey, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(rev_c) AS BIGINT) AS rev_c,
      |    CAST(sum(ret) AS BIGINT) AS n_returned,
      |    CAST(sum(lag) AS BIGINT) AS lag_sum
      |  FROM lines GROUP BY suppkey),
      |t AS (SELECT sum(rev_c) AS rev_total FROM per)
      |SELECT p.suppkey, s.s_name AS supplier_name, p.n_lines,
      |  CAST(p.rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
      |  CAST(p.rev_c AS DOUBLE) / CAST(t.rev_total AS DOUBLE) AS revenue_share,
      |  CAST(p.n_returned AS DOUBLE) / CAST(p.n_lines AS DOUBLE) AS return_rate,
      |  CAST(p.lag_sum AS DOUBLE) / CAST(p.n_lines AS DOUBLE) AS mean_lag_days
      |FROM per p
      |JOIN supplier s ON s.s_suppkey = p.suppkey
      |CROSS JOIN t
      |ORDER BY p.suppkey""".stripMargin

  // -------------------------------------------------------- xyz_classification

  /** CV with zero-months implicit: mean = Σy/M over ALL M calendar
    * months, so cv = √(M·Σy² − (Σy)²)/Σy — sparse months contribute
    * nothing and the dense part×month grid NEVER forms. Each exact
    * decimal moment is cast to DOUBLE INDIVIDUALLY before the
    * products (the `cuped_adjustment` convention — (38,0)×(38,0) is
    * a silent double-fallback in DuckDB; ADVICE r11): shared IEEE
    * text keeps bit parity while moments < 2^53, ≤1-ulp oracle
    * drift past it.
    */
  private val XyzCvExpr: String =
    "sqrt(CAST(mm AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))" +
      " / CAST(sy AS DOUBLE)"

  /** XYZ demand-variability classification — `abc_classification`'s
    * companion axis (ABC ranks by value, XYZ by predictability): per
    * part, the coefficient of variation of monthly demand over the
    * full month spine (X ≤ 0.5 steady, Y ≤ 1.0 seasonal, Z erratic —
    * the planning thresholds). Zero-demand months enter the moments
    * IMPLICITLY (see [[XyzCvExpr]]), so the computation stays on the
    * observed (part, month) frame. cv is one shared expression on
    * exact decimal(38,0) operands; class edges compare identical
    * doubles — deterministic on both engines.
    *
    * Scale shape: one partial-agg pass to the (part, month) grain,
    * one to the part grain (M broadcast as a scalar), one ≤3-row
    * class rollup. No window, no dense grid, nothing part×month-sized
    * ever materializes.
    */
  def xyzClassification(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_partkey"),
        expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").as("m"),
        expr("CAST(l_quantity * 100 AS BIGINT)").as("q"))
    val months = li.agg(countDistinct(col("m")).cast("decimal(38,0)").as("mm"))
    val perPartMonth = li.groupBy(col("l_partkey"), col("m"))
      .agg(sum(col("q")).as("y"))
    val perPart = perPartMonth.groupBy(col("l_partkey"))
      .agg(sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .crossJoin(broadcast(months))
      .withColumn("cv", expr(XyzCvExpr))
      .withColumn("xyz", expr(XyzClassExpr))
    perPart.groupBy(col("xyz"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("cv")).as("min_cv"), max(col("cv")).as("max_cv"))
      .orderBy("xyz")
  }

  /** Class edges are a planning-policy knob. The textbook retail cut
    * (0.5/1.0) assumes near-continuous demand; this event log's parts
    * sell in a handful of months, which floors the CV near 1.3 and
    * collapses every part into Z. These edges straddle the observed
    * demand regime so all three branches stay live at every SF.
    */
  private val XyzClassExpr: String =
    "CASE WHEN cv <= 1.5 THEN 'X_steady' WHEN cv <= 2.0 THEN 'Y_variable'" +
      " ELSE 'Z_erratic' END"

  val xyzClassificationSql: String =
    s"""WITH li AS (
       |  SELECT l_partkey,
       |    year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1 AS m,
       |    CAST(l_quantity * 100 AS BIGINT) AS q
       |  FROM lineitem),
       |mc AS (SELECT CAST(count(DISTINCT m) AS DECIMAL(38,0)) AS mm FROM li),
       |pm AS (
       |  SELECT l_partkey, m, CAST(sum(q) AS BIGINT) AS y
       |  FROM li GROUP BY 1, 2),
       |pp AS (
       |  SELECT l_partkey,
       |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |    sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
       |  FROM pm GROUP BY 1),
       |cvt AS (
       |  SELECT l_partkey, $XyzCvExpr AS cv
       |  FROM pp, mc),
       |cls AS (SELECT l_partkey, cv, $XyzClassExpr AS xyz FROM cvt)
       |SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts,
       |  min(cv) AS min_cv, max(cv) AS max_cv
       |FROM cls GROUP BY xyz
       |ORDER BY xyz""".stripMargin

  // ---------------------------------------------------------- ship_lag_profile

  /** Per-supplier order-to-ship latency profile: mean, exact
    * order-statistic median, and percentile_disc p90 of
    * (shipdate − orderdate) days — the supplier SLA scorecard
    * (`q12_late_lines` asks whether late lines distort priorities;
    * this ranks the suppliers causing them). Positions in pure
    * integer arithmetic, the `repeat_purchase_interval` convention;
    * mean = one division of exact day-sums.
    *
    * Scale shape: the lineitem⋈orders join shuffles on orderkey
    * (both sides pre-projected to three columns); the rank window
    * partitions BY SUPPLIER — parallel across the supplier dimension,
    * never global; output is |supplier| rows.
    */
  def shipLagProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val lags = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("date").as("ship_d"))
      .join(t.orders.select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_d")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("suppkey"),
        datediff(col("ship_d"), col("order_d")).cast("long").as("lag"))
    val ranked = lags
      .withColumn("rn", row_number().over(
        Window.partitionBy("suppkey").orderBy(col("lag"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("suppkey")))
    ranked.groupBy(col("suppkey"))
      .agg(max(col("n")).as("n_lines"),
        sum(col("lag")).as("lag_sum"),
        sum(when(col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(n + 2) div 2"), col("lag"))).as("msum"),
        sum(when(col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(n + 2) div 2"), 1L).otherwise(0L)).as("mcnt"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("lag"))).as("p90_lag_days"))
      .select(col("suppkey"), col("n_lines"),
        expr("CAST(lag_sum AS DOUBLE) / CAST(n_lines AS DOUBLE)").as("mean_lag_days"),
        expr("CAST(msum AS DOUBLE) / CAST(mcnt AS DOUBLE)").as("median_lag_days"),
        col("p90_lag_days"))
      .orderBy("suppkey")
  }

  val shipLagProfileSql: String =
    """WITH lags AS (
      |  SELECT l.l_suppkey AS suppkey,
      |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lag
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |r AS (
      |  SELECT suppkey, lag,
      |    row_number() OVER (PARTITION BY suppkey ORDER BY lag) AS rn,
      |    count(*) OVER (PARTITION BY suppkey) AS n
      |  FROM lags)
      |SELECT suppkey, CAST(max(n) AS BIGINT) AS n_lines,
      |  CAST(sum(lag) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean_lag_days,
      |  CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN lag END) AS DOUBLE)
      |    / CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    AS median_lag_days,
      |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN lag END) AS BIGINT) AS p90_lag_days
      |FROM r GROUP BY suppkey
      |ORDER BY suppkey""".stripMargin

  // -------------------------------------------------------------- arc_elasticity

  /** Arc elasticity with the midpoint formula ((q2−q1)/(q2+q1)) /
    * ((p2−p1)/(p2+p1)), p_i = rev_i/q_i — ONE shared text evaluated
    * on exactly-cast doubles, so both engines run the identical
    * correctly-rounded IEEE sequence. The flat-price/flat-volume
    * degenerate gate stays in EXACT integer space (rev·q products as
    * decimal(18,0)×(18,0) → (37,0), inside both engines' 38-digit
    * exact width — a (38,0)×(38,0) product would overflow DuckDB's
    * decimal and silently fall back to double mid-expression, which
    * is exactly the nondeterminism this discipline exists to avoid).
    * The log-free answer to "how did demand respond to the price
    * move" — point elasticity needs ln, which has no cross-engine bit
    * guarantee (the `tv_distance_drift` lesson).
    */
  private val ArcElasticityExpr: String =
    "CASE WHEN rev2 * q1 = rev1 * q2 OR q2 = q1 THEN NULL" +
      " ELSE ((CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE))" +
      " / (CAST(q2 AS DOUBLE) + CAST(q1 AS DOUBLE)))" +
      " / ((CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE)" +
      " - CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))" +
      " / (CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE)" +
      " + CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))) END"

  /** Per-brand arc price elasticity of demand between the dataset's
    * two time halves (the `price_volume_mix` split: mid = lo + Δ/2
    * on shipdate): did brands whose unit price rose sell fewer units,
    * and by how much per percent? Brands must transact in BOTH halves
    * (inner gate) — elasticity of a missing half is undefined.
    *
    * Scale shape: one conditional-sum partial-agg pass over
    * lineitem⋈part (part broadcast) to the brand grain; the scalar
    * midpoint broadcasts; everything after is per-brand scalar
    * arithmetic on the ≤|brand| frame.
    */
  def arcElasticity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dated = t.lineitem.select(col("l_partkey"),
        col("l_quantity").cast("decimal(18,0)").cast("long").as("q"),
        (money(col("l_extendedprice")) * 100).cast("long").as("p_c"),
        col("l_shipdate").cast("date").as("sd"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val mid = dated.agg(min(col("sd")).as("lo"), max(col("sd")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) / 2 AS INT))").as("mid"))
    dated.crossJoin(broadcast(mid))
      .groupBy(col("p_brand").as("brand"))
      .agg(
        sum(when(col("sd") < col("mid"), col("p_c")).otherwise(0L))
          .cast("decimal(18,0)").as("rev1"),
        sum(when(col("sd") < col("mid"), col("q")).otherwise(0L))
          .cast("decimal(18,0)").as("q1"),
        sum(when(col("sd") >= col("mid"), col("p_c")).otherwise(0L))
          .cast("decimal(18,0)").as("rev2"),
        sum(when(col("sd") >= col("mid"), col("q")).otherwise(0L))
          .cast("decimal(18,0)").as("q2"))
      .filter(col("q1") > 0 && col("q2") > 0)
      .select(col("brand"),
        col("q1").cast("long").as("qty_h1"), col("q2").cast("long").as("qty_h2"),
        expr("CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("unit_price_h1"),
        expr("CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("unit_price_h2"),
        expr(ArcElasticityExpr).as("arc_elasticity"))
      .orderBy("brand")
  }

  val arcElasticitySql: String =
    s"""WITH dated AS (
       |  SELECT p.p_brand AS brand,
       |    CAST(CAST(l.l_quantity AS DECIMAL(18,0)) AS BIGINT) AS q,
       |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_c,
       |    CAST(l.l_shipdate AS DATE) AS sd
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |m AS (SELECT min(sd) + CAST((max(sd) - min(sd)) // 2 AS INTEGER) AS mid FROM dated),
       |h AS (
       |  SELECT brand,
       |    CAST(sum(CASE WHEN sd < mid THEN p_c ELSE 0 END) AS DECIMAL(18,0)) AS rev1,
       |    CAST(sum(CASE WHEN sd < mid THEN q ELSE 0 END) AS DECIMAL(18,0)) AS q1,
       |    CAST(sum(CASE WHEN sd >= mid THEN p_c ELSE 0 END) AS DECIMAL(18,0)) AS rev2,
       |    CAST(sum(CASE WHEN sd >= mid THEN q ELSE 0 END) AS DECIMAL(18,0)) AS q2
       |  FROM dated, m GROUP BY brand)
       |SELECT brand,
       |  CAST(q1 AS BIGINT) AS qty_h1, CAST(q2 AS BIGINT) AS qty_h2,
       |  CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE) / CAST(100 AS DOUBLE) AS unit_price_h1,
       |  CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE) / CAST(100 AS DOUBLE) AS unit_price_h2,
       |  $ArcElasticityExpr AS arc_elasticity
       |FROM h WHERE q1 > 0 AND q2 > 0
       |ORDER BY brand""".stripMargin

  // ------------------------------------------------------- new_product_adoption

  /** Catalog adoption curve: per month, how many parts sold for the
    * FIRST time, and the cumulative distinct catalog ever sold — the
    * assortment-rollout readout (a flattening curve = the long tail
    * never transacts; pair with `xyz_classification` for what the
    * adopted parts then do). First-sale month is a min-aggregate, the
    * curve one cumulative window over the calendar-bounded month
    * frame; all counts exact.
    */
  def newProductAdoption(spark: SparkSession, dir: String): DataFrame = {
    val firstSale = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey"))
      .agg(min(expr("year(l_shipdate) * 12 + month(l_shipdate) - 1")).as("m"))
    firstSale.groupBy(col("m"))
      .agg(count(lit(1)).as("n_new_parts"))
      .withColumn("cum_parts", sum(col("n_new_parts")).over(
        Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)))
      .select(expr("CAST(m div 12 AS INT)").as("yr"),
        expr("CAST(m % 12 + 1 AS INT)").as("mo"),
        col("n_new_parts"), col("cum_parts"))
      .orderBy("yr", "mo")
  }

  val newProductAdoptionSql: String =
    """WITH fs AS (
      |  SELECT l_partkey,
      |    min(year(CAST(l_shipdate AS DATE)) * 12
      |      + month(CAST(l_shipdate AS DATE)) - 1) AS m
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT m, CAST(count(*) AS BIGINT) AS n_new_parts FROM fs GROUP BY m)
      |SELECT CAST(m // 12 AS INTEGER) AS yr, CAST(m % 12 + 1 AS INTEGER) AS mo,
      |  n_new_parts,
      |  CAST(sum(n_new_parts) OVER (ORDER BY m
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_parts
      |FROM c ORDER BY yr, mo""".stripMargin

  // ------------------------------------------------------ order_size_distribution

  /** Lines-per-order distribution — the basket-width profile that
    * sizes every order-grain operator (collect_set baskets, the Σ
    * basket² pair-join bound the dedup/graph families lean on): for
    * each order width, how many orders, their share, and the
    * cumulative share. All counts exact; shares are single divisions;
    * the cumulative window runs over the ≤max-width frame.
    */
  def orderSizeDistribution(spark: SparkSession, dir: String): DataFrame = {
    val widths = Tables(spark, dir).lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
    val tot = widths.agg(sum(col("n_orders")).as("n_total"))
    widths.crossJoin(broadcast(tot))
      .withColumn("cum_orders", sum(col("n_orders")).over(
        Window.orderBy("n_lines").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("n_lines"), col("n_orders"),
        expr("CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE)").as("share"),
        expr("CAST(cum_orders AS DOUBLE) / CAST(n_total AS DOUBLE)").as("cum_share"))
      .orderBy("n_lines")
  }

  val orderSizeDistributionSql: String =
    """WITH w AS (
      |  SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders FROM (
      |    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
      |    FROM lineitem GROUP BY 1)
      |  GROUP BY n_lines),
      |t AS (SELECT sum(n_orders) AS n_total FROM w),
      |c AS (
      |  SELECT n_lines, n_orders, n_total,
      |    sum(n_orders) OVER (ORDER BY n_lines
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_orders
      |  FROM w, t)
      |SELECT n_lines, n_orders,
      |  CAST(n_orders AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
      |  CAST(cum_orders AS DOUBLE) / CAST(n_total AS DOUBLE) AS cum_share
      |FROM c ORDER BY n_lines""".stripMargin

  // ------------------------------------------------------------ croston_demand

  /** Croston-style intermittent-demand rate per part — the
    * replenishment forecast for the `xyz_classification` Z class,
    * where a plain monthly mean is mostly zeros and a trend line is
    * meaningless: split the signal into mean NONZERO demand size and
    * mean inter-demand interval, and forecast their ratio (the
    * bias-free empirical variant of Croston's smoothing — means
    * instead of EWMA states, so every number is one division of
    * exact integers and parity is structural). Top 100 parts by
    * rate: the intermittent movers worth stocking ahead.
    *
    * mean_interval = (last − first)/(k − 1) active months;
    * croston_rate = (Σqty·(k−1)) / (k·(last − first)) — both single
    * double divisions of exact sub-2^53 integer products.
    *
    * Scale shape: one partial-agg pass to the (part, month) grain,
    * one to the part grain, a rank-k cut — the dim-build reduction;
    * nothing line-item-sized survives the first shuffle.
    */
  def crostonDemand(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1).as("m"))
      .agg(sum(expr("CAST(l_quantity * 100 AS BIGINT)")).as("q_c"))
    pm.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("k"), sum(col("q_c")).as("q_tot"),
        min(col("m")).as("m0"), max(col("m")).as("m1"))
      .filter(col("k") >= 2)
      .select(col("l_partkey").as("part_key"), col("k").as("n_active_months"),
        expr("CAST(q_tot AS DOUBLE) / CAST(k AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("mean_demand"),
        expr("CAST(m1 - m0 AS DOUBLE) / CAST(k - 1 AS DOUBLE)")
          .as("mean_interval_months"),
        expr("CAST(q_tot * (k - 1) AS DOUBLE) / CAST(k * (m1 - m0) AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("croston_rate"))
      .orderBy(col("croston_rate").desc, col("part_key"))
      .limit(100)
  }

  val crostonDemandSql: String =
    """WITH pm AS (
      |  SELECT l_partkey,
      |    year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m,
      |    CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS q_c
      |  FROM lineitem GROUP BY 1, 2),
      |st AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(q_c) AS BIGINT) AS q_tot,
      |    min(m) AS m0, max(m) AS m1
      |  FROM pm GROUP BY 1)
      |SELECT l_partkey AS part_key, k AS n_active_months,
      |  CAST(q_tot AS DOUBLE) / CAST(k AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_demand,
      |  CAST(m1 - m0 AS DOUBLE) / CAST(k - 1 AS DOUBLE) AS mean_interval_months,
      |  CAST(q_tot * (k - 1) AS DOUBLE) / CAST(k * (m1 - m0) AS DOUBLE) / CAST(100 AS DOUBLE) AS croston_rate
      |FROM st WHERE k >= 2
      |ORDER BY croston_rate DESC, part_key LIMIT 100""".stripMargin

  // ------------------------------------------------------------ abc_xyz_matrix

  /** The ABC × XYZ planning matrix — `abc_classification` (value
    * rank) crossed with `xyz_classification` (demand variability) at
    * part grain, rolled to the 9-cell policy grid every inventory
    * planner works from (AX = automate replenishment, CZ = make to
    * order). Each cell: part count, revenue, revenue share. Both
    * classifications re-derive their exact part-grain builds (integer
    * cum-share edges, the shared [[XyzCvExpr]]); the join is
    * key-aligned by construction (both sides derive from the same
    * lineitem part set).
    *
    * Scale shape: two part-grain aggregates off one lineitem pass
    * each, a part-grain equi-join, a 9-row rollup. The global ABC
    * rank window is the `histogram_equidepth` range-partitioned sort
    * at 100 TB.
    */
  def abcXyzMatrix(spark: SparkSession, dir: String): DataFrame = {
    // ONE lineitem scan: both classifications partial-aggregate to
    // the (part, month) grain first — revenue decimal sums associate
    // exactly, so summing month slices to the part grain is
    // bit-identical to a direct part-grain pass (the abc build), and
    // the XYZ moments need the month grain anyway. A second scan
    // would re-read the fact table for numbers this frame already
    // carries. pm is cached for its three consumers (months scalar,
    // part-grain rollup; released by the harness).
    val pm = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey"),
        expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").as("m"))
      .agg(sum(expr("CAST(l_quantity * 100 AS BIGINT)")).as("y"),
        sum(money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount")))).as("rev_m"))
      .cache()
    graft.core.OwnedCaches.own(pm)
    val months = pm.agg(countDistinct(col("m")).cast("decimal(38,0)").as("mm"))
    val perPart = pm.groupBy(col("l_partkey"))
      .agg((sum(col("rev_m")) * 10000).cast("long").as("rev_c"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
    val w = Window.orderBy(col("rev_c").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perPart.agg(sum(col("rev_c")).cast("decimal(38,0)").as("total_c"))
    perPart
      .crossJoin(broadcast(months))
      .crossJoin(broadcast(tot))
      .withColumn("cum_c", sum(col("rev_c").cast("decimal(38,0)")).over(w))
      .withColumn("abc_class",
        expr("CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A' " +
          "WHEN cum_c * 100 <= total_c * 95 THEN 'B' ELSE 'C' END"))
      .withColumn("cv", expr(XyzCvExpr))
      .withColumn("xyz_class", expr(XyzClassExpr))
      .groupBy(col("abc_class"), col("xyz_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev_c").cast("decimal(38,0)")).as("cell_c"),
        max(col("total_c")).as("total_c"))
      .select(col("abc_class"), col("xyz_class"), col("n_parts"),
        expr("CAST(cell_c AS DOUBLE) / CAST(10000 AS DOUBLE)").as("revenue"),
        expr("CAST(cell_c AS DOUBLE) / CAST(total_c AS DOUBLE)").as("revenue_share"))
      .orderBy("abc_class", "xyz_class")
  }

  val abcXyzMatrixSql: String =
    s"""WITH rev AS (
       |  SELECT l_partkey,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS rev_c
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(rev_c) AS DECIMAL(38,0)) AS total_c FROM rev),
       |abc AS (
       |  SELECT l_partkey, rev_c,
       |    CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A'
       |         WHEN cum_c * 100 <= total_c * 95 THEN 'B' ELSE 'C' END AS abc_class
       |  FROM (SELECT l_partkey, rev_c, total_c,
       |          sum(CAST(rev_c AS DECIMAL(38,0))) OVER (ORDER BY rev_c DESC, l_partkey
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
       |        FROM rev, t)),
       |li AS (
       |  SELECT l_partkey,
       |    year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1 AS m,
       |    CAST(l_quantity * 100 AS BIGINT) AS q
       |  FROM lineitem),
       |mc AS (SELECT CAST(count(DISTINCT m) AS DECIMAL(38,0)) AS mm FROM li),
       |pm AS (SELECT l_partkey, m, CAST(sum(q) AS BIGINT) AS y FROM li GROUP BY 1, 2),
       |xyz AS (
       |  SELECT l_partkey AS xp, $XyzClassExpr AS xyz_class
       |  FROM (SELECT l_partkey, $XyzCvExpr AS cv
       |        FROM (SELECT l_partkey,
       |                sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |                sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
       |              FROM pm GROUP BY 1), mc))
       |SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
       |  CAST(sum(CAST(rev_c AS DECIMAL(38,0))) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue,
       |  CAST(sum(CAST(rev_c AS DECIMAL(38,0))) AS DOUBLE) / CAST((SELECT total_c FROM t) AS DOUBLE) AS revenue_share
       |FROM abc JOIN xyz ON xyz.xp = abc.l_partkey
       |GROUP BY 1, 2 ORDER BY abc_class, xyz_class""".stripMargin

  // ------------------------------------------------------ inventory_reorder_point

  /** Reorder-point table per part: ROP = μ_d·L + z·σ_d·√L with a
    * 7-day lead time and z = 1.645 (95% service level) — the
    * safety-stock number `croston_demand` (rate) and
    * `xyz_classification` (variability class) feed into. Daily
    * demand moments use the zero-days-implicit identity over the
    * D-day spine (sparse days contribute nothing, the dense
    * part×day grid never forms): μ = Σq/D, σ = √(D·Σq² − (Σq)²)/D —
    * exact integer moments cast to DOUBLE individually, the whole
    * ROP one shared IEEE text (sqrt/multiply/add on identical
    * operands). Top 50 parts by ROP.
    *
    * Scale shape: one partial-agg pass to the (part, day) grain, one
    * to the part grain, the day-count scalar broadcast — the
    * `xyz_classification` shape on the day axis.
    */
  private val LeadDays = 7
  private val ServiceZ = "1.645"

  private val RopExpr: String =
    s"CAST(sq AS DOUBLE) / CAST(dd AS DOUBLE) * CAST($LeadDays AS DOUBLE)" +
      s" + CAST($ServiceZ AS DOUBLE)" +
      s" * (sqrt(CAST(dd AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))" +
      s" / CAST(dd AS DOUBLE)) * sqrt(CAST($LeadDays AS DOUBLE))"

  def inventoryReorderPoint(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_partkey"), col("l_shipdate").cast("date").as("d"),
        expr("CAST(l_quantity * 100 AS BIGINT)").as("q"))
    val days = li.agg(countDistinct(col("d")).cast("decimal(38,0)").as("dd"))
    li.groupBy(col("l_partkey"), col("d"))
      .agg(sum(col("q")).as("y"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_active_days"),
        sum(col("y").cast("decimal(38,0)")).as("sq"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("sqq"))
      .crossJoin(broadcast(days))
      .select(col("l_partkey").as("part_key"), col("n_active_days"),
        expr("CAST(sq AS DOUBLE) / CAST(dd AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("mean_daily_demand"),
        expr(s"($RopExpr) / CAST(100 AS DOUBLE)").as("reorder_point"))
      .orderBy(col("reorder_point").desc, col("part_key"))
      .limit(50)
  }

  val inventoryReorderPointSql: String =
    s"""WITH li AS (
       |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
       |    CAST(l_quantity * 100 AS BIGINT) AS q
       |  FROM lineitem),
       |dc AS (SELECT CAST(count(DISTINCT d) AS DECIMAL(38,0)) AS dd FROM li),
       |pd AS (SELECT l_partkey, d, CAST(sum(q) AS BIGINT) AS y FROM li GROUP BY 1, 2),
       |pp AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_active_days,
       |    sum(CAST(y AS DECIMAL(38,0))) AS sq,
       |    sum(CAST(y AS DECIMAL(38,0)) * y) AS sqq
       |  FROM pd GROUP BY 1)
       |SELECT l_partkey AS part_key, n_active_days,
       |  CAST(sq AS DOUBLE) / CAST(dd AS DOUBLE) / CAST(100 AS DOUBLE) AS mean_daily_demand,
       |  ($RopExpr) / CAST(100 AS DOUBLE) AS reorder_point
       |FROM pp, dc
       |ORDER BY reorder_point DESC, part_key LIMIT 50""".stripMargin

  // --------------------------------------------------------- pareto_threshold

  private val ParetoPcts = Seq(50, 80, 90)

  /** Pareto concentration thresholds: the MINIMUM number of customers
    * (ranked by revenue, descending) whose cumulative revenue reaches
    * 50 / 80 / 90% of the total — the "how many accounts are 80% of
    * the business" number account teams size themselves by. The point
    * answer `lorenz_curve` (fixed deciles) and `hhi_concentration`
    * (one index) don't give directly. The reach test is EXACT integer
    * arithmetic (cum·100 ≥ total·pct — no float share ever compared),
    * and because the running sum is monotone, a conditional MIN picks
    * both the threshold rank and the revenue attained at it in one
    * aggregate.
    *
    * Scale shape: orders reduce to the customer-grain frame in one
    * partial-agg pass; the global rank/cumsum runs on that bounded
    * frame as a two-level prefix sum ([[Commerce.globalRankCumsum]] —
    * banded local rank/cumsum windows + broadcast bucket offsets, no
    * unpartitioned window), then ONE row of conditional mins.
    */
  def paretoThreshold(spark: SparkSession, dir: String): DataFrame = {
    // cached: the rank/cumsum pass AND the grand-total scalar read
    // this customer-grain frame (one orders scan; harness-released)
    val byCust = graft.core.OwnedCaches.own(Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg((sum(money(col("o_totalprice"))) * 100).cast("long").as("rev_c"))
      .cache())
    // distributed rank + running revenue sum in ONE two-level
    // prefix-sum pass (globalRankCumsum — descending-revenue band
    // buckets at the MonetaryBucketWidth convention): equal to the
    // oracle's global row_number/cumsum windows by construction,
    // with no single-task sort over the customer frame
    val bandC = (Commerce.MonetaryBucketWidth * 100).toLong
    val tot = byCust.agg(sum(col("rev_c")).as("total_c"))
    val ranked = Commerce.globalRankCumsum(byCust,
        -floor(col("rev_c") / bandC),
        Seq(col("rev_c").desc, col("o_custkey")),
        col("rev_c"), "rnk", "cum_c")
      .crossJoin(broadcast(tot))
    val aggCols =
      Seq(max(col("rnk")).as("ntot"), max(col("total_c")).as("tot_c")) ++
        ParetoPcts.flatMap { p =>
          val reached = col("cum_c") * 100 >= col("total_c") * p
          Seq(min(when(reached, col("rnk"))).as(s"n_$p"),
            min(when(reached, col("cum_c"))).as(s"c_$p"))
        }
    val stackArgs = ParetoPcts.map(p => s"$p, n_$p, c_$p").mkString(", ")
    ranked.agg(aggCols.head, aggCols.tail: _*)
      .selectExpr("ntot", "tot_c",
        s"stack(${ParetoPcts.size}, $stackArgs) AS (pct, n_customers, cum_c)")
      .selectExpr("CAST(pct AS INTEGER) AS pct",
        "CAST(n_customers AS BIGINT) AS n_customers",
        "CAST(n_customers AS DOUBLE) / CAST(ntot AS DOUBLE) AS cust_share",
        "CAST(cum_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS rev_share")
      .orderBy("pct")
  }

  val paretoThresholdSql: String = {
    val aggs = ParetoPcts.flatMap { p =>
      val reached = s"cum_c * 100 >= total_c * $p"
      Seq(s"min(CASE WHEN $reached THEN rnk END) AS n_$p",
        s"min(CASE WHEN $reached THEN cum_c END) AS c_$p")
    }
    val arms = ParetoPcts
      .map(p => s"SELECT ntot, tot_c, $p AS pct, n_$p AS n_customers, c_$p AS cum_c FROM a")
      .mkString("\n  UNION ALL ")
    s"""WITH byc AS (
       |  SELECT o_custkey,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
       |  FROM orders GROUP BY 1),
       |r AS (
       |  SELECT o_custkey, rev_c,
       |    row_number() OVER win AS rnk,
       |    sum(rev_c) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
       |    sum(rev_c) OVER () AS total_c
       |  FROM byc
       |  WINDOW win AS (ORDER BY rev_c DESC, o_custkey)),
       |a AS (
       |  SELECT max(rnk) AS ntot, max(total_c) AS tot_c,
       |    ${aggs.mkString(",\n    ")}
       |  FROM r),
       |s AS (
       |  $arms)
       |SELECT CAST(pct AS INTEGER) AS pct,
       |  CAST(n_customers AS BIGINT) AS n_customers,
       |  CAST(n_customers AS DOUBLE) / CAST(ntot AS DOUBLE) AS cust_share,
       |  CAST(cum_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS rev_share
       |FROM s ORDER BY pct""".stripMargin
  }

  // ---------------------------------------------------- price_point_profile

  /** Per-brand price-architecture profile: distinct price points,
    * band (min/max), and the modal price with its share — the "what
    * does this brand's price ladder look like" table assortment and
    * pricing reviews start from (complements `histogram_price`,
    * which bins the whole catalog, and `arc_elasticity`, which
    * moves one price). Prices are exact 2-dp decimals end-to-end;
    * the modal pick ties to the LOWEST price on both engines.
    *
    * Scale shape: two partial-agg passes over the part dim (brand ×
    * price grain then brand grain) — dimension-bounded at any
    * corpus; no fact table involved.
    */
  def pricePointProfile(spark: SparkSession, dir: String): DataFrame = {
    val pp = Tables(spark, dir).part
      .select(col("p_brand"), money(col("p_retailprice")).as("price"))
    val cnt = pp.groupBy(col("p_brand"), col("price")).agg(count(lit(1)).as("c"))
    val modal = cnt.withColumn("rn", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("c").desc, col("price"))))
      .filter(col("rn") === 1)
      .select(col("p_brand"), col("price").as("modal_price_d"), col("c").as("modal_n"))
    cnt.groupBy(col("p_brand"))
      .agg(sum(col("c")).as("n_parts"), count(lit(1)).as("n_prices"),
        min(col("price")).as("min_price_d"), max(col("price")).as("max_price_d"))
      .join(modal, "p_brand")
      .selectExpr("p_brand AS brand",
        "CAST(n_parts AS BIGINT) AS n_parts",
        "CAST(n_prices AS BIGINT) AS n_price_points",
        "CAST(min_price_d AS DOUBLE) AS min_price",
        "CAST(max_price_d AS DOUBLE) AS max_price",
        "CAST(modal_price_d AS DOUBLE) AS modal_price",
        "CAST(modal_n AS DOUBLE) / CAST(n_parts AS DOUBLE) AS modal_share")
      .orderBy("brand")
  }

  val pricePointProfileSql: String =
    """WITH pp AS (
      |  SELECT p_brand, CAST(p_retailprice AS DECIMAL(18,2)) AS price FROM part),
      |cnt AS (SELECT p_brand, price, CAST(count(*) AS BIGINT) AS c
      |        FROM pp GROUP BY 1, 2),
      |modal AS (
      |  SELECT p_brand, price AS modal_price_d, c AS modal_n FROM (
      |    SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY c DESC, price) AS rn
      |    FROM cnt) r0 WHERE rn = 1),
      |agg AS (
      |  SELECT p_brand, CAST(sum(c) AS BIGINT) AS n_parts,
      |    CAST(count(*) AS BIGINT) AS n_prices,
      |    min(price) AS min_price_d, max(price) AS max_price_d
      |  FROM cnt GROUP BY 1)
      |SELECT a.p_brand AS brand, n_parts, n_prices AS n_price_points,
      |  CAST(min_price_d AS DOUBLE) AS min_price,
      |  CAST(max_price_d AS DOUBLE) AS max_price,
      |  CAST(modal_price_d AS DOUBLE) AS modal_price,
      |  CAST(modal_n AS DOUBLE) / CAST(n_parts AS DOUBLE) AS modal_share
      |FROM agg a JOIN modal m ON m.p_brand = a.p_brand
      |ORDER BY brand""".stripMargin

  // ----------------------------------------------------- return_rate_by_brand

  /** Per-brand return KPI: line and revenue return rates off the
    * `l_returnflag = 'R'` mark — the merchandising quality scorecard
    * (`q10_returns` ranks CUSTOMERS by returned revenue; this scores
    * the PRODUCT side, where assortment decisions act). Counts and
    * cent sums are exact; the two rates are single exact-integer
    * divisions, so ordering by rate is deterministic.
    *
    * Scale shape: one lineitem⋈part equi-join on the part key (the
    * brand-join grain every basket op shares) followed by a
    * partial-agg reduce to the 25-row brand frame — no other
    * shuffle.
    */
  def returnRateByBrand(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .select(col("l_partkey"), col("l_returnflag"),
        ((money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))) * 10000)
          .cast("long").as("rev_c"))
      .join(t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(col("rev_c")).as("s_rev"),
        sum(when(col("l_returnflag") === "R", col("rev_c")).otherwise(0L)).as("s_ret"))
      .selectExpr("p_brand AS brand",
        "CAST(n_lines AS BIGINT) AS n_lines",
        "CAST(n_returned AS BIGINT) AS n_returned",
        "CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS line_return_rate",
        "CAST(s_rev AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue",
        "CAST(s_ret AS DOUBLE) / CAST(s_rev AS DOUBLE) AS revenue_return_share")
      .orderBy(col("line_return_rate").desc, col("brand"))
  }

  val returnRateByBrandSql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_c
      |  FROM lineitem),
      |g AS (
      |  SELECT p_brand,
      |    CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |    CAST(sum(rev_c) AS BIGINT) AS s_rev,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN rev_c ELSE 0 END) AS BIGINT) AS s_ret
      |  FROM li JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1)
      |SELECT p_brand AS brand, n_lines, n_returned,
      |  CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS line_return_rate,
      |  CAST(s_rev AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue,
      |  CAST(s_ret AS DOUBLE) / CAST(s_rev AS DOUBLE) AS revenue_return_share
      |FROM g ORDER BY line_return_rate DESC, brand""".stripMargin

  // ------------------------------------------------ discount_depth_response

  /** Demand response by discount depth: for each percent of discount
    * actually granted, the line volume, average quantity, and share
    * of gross revenue — the first read a pricing team takes before
    * the elasticity models (`arc_elasticity`, `cross_price_elasticity`
    * fit curves; this is the raw response table they fit against,
    * and the depth mix itself is the margin-leak audit). Depth is an
    * exact integer percent (discounts are stored at 2 dp), all sums
    * are exact decimal/bigint, shares and averages are single final
    * divisions.
    *
    * Scale shape: ONE lineitem pass partial-aggregates to ≤ 11 depth
    * rows; the revenue-share window runs over that bounded frame.
    */
  def discountDepthResponse(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir).lineitem
      .select(expr("CAST(round(l_discount * 100) AS INTEGER)").as("depth_pct"),
        col("l_quantity"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("net"))
    l.groupBy(col("depth_pct"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("qty"),
        (sum(col("net")) * 10000).cast("long").as("rev_c"))
      .withColumn("tot_c", sum(col("rev_c")).over(Window.partitionBy()))
      .selectExpr("depth_pct", "n_lines",
        "CAST(qty AS DOUBLE) / CAST(n_lines AS DOUBLE) AS avg_qty",
        "CAST(rev_c AS DOUBLE) / CAST(10000 AS DOUBLE) AS net_revenue",
        "CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS rev_share")
      .orderBy("depth_pct")
  }

  val discountDepthResponseSql: String =
    """WITH l AS (
      |  SELECT CAST(round(l_discount * 100) AS INTEGER) AS depth_pct,
      |    l_quantity,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS net
      |  FROM lineitem),
      |g AS (
      |  SELECT depth_pct, CAST(count(*) AS BIGINT) AS n_lines,
      |    sum(l_quantity) AS qty,
      |    CAST(sum(net) * 10000 AS BIGINT) AS rev_c
      |  FROM l GROUP BY 1),
      |t AS (SELECT *, sum(rev_c) OVER () AS tot_c FROM g)
      |SELECT depth_pct, n_lines,
      |  CAST(qty AS DOUBLE) / CAST(n_lines AS DOUBLE) AS avg_qty,
      |  CAST(rev_c AS DOUBLE) / CAST(10000 AS DOUBLE) AS net_revenue,
      |  CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS rev_share
      |FROM t ORDER BY depth_pct""".stripMargin

  // ---------------------------------------------------------- loglog_elasticity

  /** Canonical log-log demand elasticity per brand: regress
    * ln(quantity) on ln(net unit price) across the brand's realized
    * price points — the OLS slope IS the constant-elasticity
    * exponent (`arc_elasticity` reads one adjacent-period arc;
    * `cross_price_elasticity` reads brand pairs; this is the curve
    * fit pricing actually quotes, and `discount_depth_response` is
    * the raw table it fits). Price points are exact cents (net of
    * discount, rounded), quantities exact sums; both logs are
    * engine-exact [[graft.functions.ExactLn]]; per-brand moments
    * reduce via round-to-decimal sums and the slope is the
    * `regression_trend` fixed-order form. Degenerate brands (single
    * price point) report 0.
    *
    * Scale shape: one lineitem pass joins the broadcast part dim,
    * partial-aggregates to (brand, price-point) — bounded by the
    * brand × realized-price grid — then to brand grain.
    */
  def loglogElasticity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    val t = Tables(spark, dir)
    val pts = t.lineitem
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) / l_quantity * 100) AS BIGINT)").as("price_c"),
        col("l_quantity"))
      .groupBy(col("p_brand"), col("price_c"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    pts
      .withColumn("px", expr("CAST(price_c AS DOUBLE) / CAST(100 AS DOUBLE)"))
      .withColumn("qy", expr("CAST(qty AS DOUBLE)"))
      .withColumn("__yx", expr(ExactLn.yExpr("px")))
      .withColumn("__zx", expr(ExactLn.zExpr("__yx")))
      .withColumn("__yy", expr(ExactLn.yExpr("qy")))
      .withColumn("__zy", expr(ExactLn.zExpr("__yy")))
      .withColumn("lx", expr(ExactLn.lnExpr("__zx")))
      .withColumn("ly", expr(ExactLn.lnExpr("__zy")))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_points"),
        sum(expr("CAST(round(lx, 9) AS DECIMAL(18,9))")).as("sx"),
        sum(expr("CAST(round(ly, 9) AS DECIMAL(18,9))")).as("sy"),
        sum(expr("CAST(round(lx * ly, 9) AS DECIMAL(18,9))")).as("sxy"),
        sum(expr("CAST(round(lx * lx, 9) AS DECIMAL(18,9))")).as("sxx"))
      .selectExpr("p_brand AS brand", "CAST(n_points AS BIGINT) AS n_points",
        """CASE WHEN CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = CAST(0 AS DOUBLE)
          |THEN CAST(0 AS DOUBLE)
          |ELSE (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS elasticity""".stripMargin,
        "CAST(sx AS DOUBLE) / CAST(n_points AS DOUBLE) AS ln_price_mean",
        "CAST(sy AS DOUBLE) / CAST(n_points AS DOUBLE) AS ln_qty_mean")
      .orderBy("brand")
  }

  val loglogElasticitySql: String = {
    import graft.functions.ExactLn
    s"""WITH pts AS (
       |  SELECT p_brand,
       |    CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) / l_quantity * 100) AS BIGINT) AS price_c,
       |    l_quantity
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |g AS (
       |  SELECT p_brand, price_c, CAST(sum(l_quantity) AS BIGINT) AS qty
       |  FROM pts GROUP BY 1, 2),
       |d AS (SELECT *, CAST(price_c AS DOUBLE) / CAST(100 AS DOUBLE) AS px,
       |    CAST(qty AS DOUBLE) AS qy FROM g),
       |y AS (SELECT *, ${ExactLn.yExpr("px")} AS __yx, ${ExactLn.yExpr("qy")} AS __yy FROM d),
       |z AS (SELECT *, ${ExactLn.zExpr("__yx")} AS __zx, ${ExactLn.zExpr("__yy")} AS __zy FROM y),
       |l AS (SELECT *, ${ExactLn.lnExpr("__zx")} AS lx, ${ExactLn.lnExpr("__zy")} AS ly FROM z),
       |m AS (
       |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_points,
       |    sum(CAST(round(lx, 9) AS DECIMAL(18,9))) AS sx,
       |    sum(CAST(round(ly, 9) AS DECIMAL(18,9))) AS sy,
       |    sum(CAST(round(lx * ly, 9) AS DECIMAL(18,9))) AS sxy,
       |    sum(CAST(round(lx * lx, 9) AS DECIMAL(18,9))) AS sxx
       |  FROM l GROUP BY 1)
       |SELECT p_brand AS brand, n_points,
       |  CASE WHEN CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = CAST(0 AS DOUBLE)
       |  THEN CAST(0 AS DOUBLE)
       |  ELSE (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS elasticity,
       |  CAST(sx AS DOUBLE) / CAST(n_points AS DOUBLE) AS ln_price_mean,
       |  CAST(sy AS DOUBLE) / CAST(n_points AS DOUBLE) AS ln_qty_mean
       |FROM m ORDER BY brand""".stripMargin
  }

  // ------------------------------------------------------------ hill_tail_index

  private val HillK = 100

  /** Hill estimator of the order-value tail index over the top-100
    * orders: α̂ = (k−1) / Σ ln(xᵢ/x₍ₖ₎) — HOW heavy the heavy tail is
    * (`pareto_threshold` locates the 80% revenue cut, `hhi_concentration`
    * scores share concentration; the tail index is the exponent that
    * says whether the next 10× customer is plausible — α ≤ 2 means
    * infinite variance and revenue forecasting off order means is
    * broken). Cents are exact BIGINT; each ratio casts two sub-2⁵³
    * integers individually; logs are the engine-exact
    * [[graft.functions.ExactLn]]; the xᵢ = x₍ₖ₎ boundary terms
    * contribute exactly 0 (ln 1), so ties at the cut are harmless.
    *
    * Scale shape: ONE distributed top-k (TakeOrdered — no global
    * sort) bounds everything; the estimator runs on the 100-row
    * frame.
    */
  def hillTailIndex(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    val top = Tables(spark, dir).orders
      .select(col("o_orderkey"),
        (money(col("o_totalprice")) * 100).cast("long").as("cents"))
      .orderBy(col("cents").desc, col("o_orderkey"))
      .limit(HillK)
    top
      .withColumn("xk", min(col("cents")).over(Window.partitionBy()))
      .withColumn("ratio", expr("CAST(cents AS DOUBLE) / CAST(xk AS DOUBLE)"))
      .withColumn("__y", expr(ExactLn.yExpr("ratio")))
      .withColumn("__z", expr(ExactLn.zExpr("__y")))
      .withColumn("lr", expr(ExactLn.lnExpr("__z")))
      .agg(count(lit(1)).as("k"),
        min(col("xk")).as("xkc"),
        sum(expr("CAST(round(lr, 9) AS DECIMAL(18,9))")).as("sd"))
      .selectExpr("CAST(k AS BIGINT) AS k",
        "CAST(xkc AS DOUBLE) / CAST(100 AS DOUBLE) AS x_k",
        "CAST(sd AS DOUBLE) AS sum_log_ratio",
        """CASE WHEN CAST(sd AS DOUBLE) = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
          |ELSE CAST(k - 1 AS DOUBLE) / CAST(sd AS DOUBLE) END AS tail_index""".stripMargin)
  }

  val hillTailIndexSql: String = {
    import graft.functions.ExactLn
    s"""WITH top AS (
       |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM orders ORDER BY cents DESC, o_orderkey LIMIT $HillK),
       |w AS (SELECT *, min(cents) OVER () AS xk FROM top),
       |r AS (SELECT *, CAST(cents AS DOUBLE) / CAST(xk AS DOUBLE) AS ratio FROM w),
       |y AS (SELECT *, ${ExactLn.yExpr("ratio")} AS __y FROM r),
       |z AS (SELECT *, ${ExactLn.zExpr("__y")} AS __z FROM y),
       |x AS (SELECT *, ${ExactLn.lnExpr("__z")} AS lr FROM z),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(min(xk) AS BIGINT) AS xkc,
       |    sum(CAST(round(lr, 9) AS DECIMAL(18,9))) AS sd
       |  FROM x)
       |SELECT k, CAST(xkc AS DOUBLE) / CAST(100 AS DOUBLE) AS x_k,
       |  CAST(sd AS DOUBLE) AS sum_log_ratio,
       |  CASE WHEN CAST(sd AS DOUBLE) = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(k - 1 AS DOUBLE) / CAST(sd AS DOUBLE) END AS tail_index
       |FROM a""".stripMargin
  }

  // ---------------------------------------------------------- newsvendor_stock

  // critical ratio 0.8 as the exact integer rank ceil(8n/10) =
  // (8n+9) div 10 — never floor(n·0.8) in IEEE (5·0.8 rounds to
  // 4.000000000000000222 and ceil'ing it is off by one)
  private val NewsvendorEpoch = "1990-01-01"

  /** Newsvendor stocking level per brand: the critical-ratio (0.8)
    * quantile of WEEKLY shipped demand — the classic single-period
    * inventory answer (stock at P[demand ≤ S] ≥ cu/(cu+co)), which
    * `inventory_reorder_point`'s mean+safety-stock normal
    * approximation isn't: this one reads the EMPIRICAL distribution,
    * so it's right under skew and intermittency. Quantiles are exact
    * order statistics via the integer ceil-rank (no percentile_disc
    * — its edge-interpolation differs subtly across engines), plus
    * the achieved service level = share of weeks the chosen stock
    * would have covered. mean_weekly is exact-integer / count.
    *
    * Scale shape: ONE lineitem pass with the part dim broadcast
    * reduces to (brand, week) — partial aggregation map-side; the
    * rank window partitions by brand over the bounded week spine;
    * the coverage re-join is brand-keyed on that same bounded frame.
    */
  def newsvendorStock(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val weekly = graft.core.OwnedCaches.own(
      t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          expr(s"CAST(datediff(CAST(l_shipdate AS DATE), DATE'$NewsvendorEpoch') AS BIGINT) div 7")
            .as("wk"))
        .agg(sum(col("l_quantity").cast("decimal(18,0)")).cast("long").as("demand"))
        .cache())
    val wD = Window.partitionBy("p_brand").orderBy(col("demand"), col("wk"))
    val per = weekly
      .withColumn("rn", row_number().over(wD))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("p_brand")))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_weeks"), sum(col("demand")).as("tot"),
        max(when(col("rn") === expr("(8 * cnt + 9) div 10"), col("demand"))).as("stock"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("demand"))).as("p50"))
    val svc = weekly
      .join(per.select(col("p_brand"), col("stock")), Seq("p_brand"))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("demand") <= col("stock"), 1L).otherwise(0L)).as("wk_cov"))
    per.join(svc, Seq("p_brand"))
      .selectExpr("p_brand AS brand", "CAST(n_weeks AS BIGINT) AS n_weeks",
        "CAST(tot AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS mean_weekly",
        "CAST(p50 AS BIGINT) AS p50_demand",
        "CAST(stock AS BIGINT) AS stock_level",
        "CAST(wk_cov AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS service_level")
      .orderBy("brand")
  }

  val newsvendorStockSql: String =
    s"""WITH weekly AS (
       |  SELECT p_brand,
       |    CAST(date_diff('day', DATE '$NewsvendorEpoch', CAST(l_shipdate AS DATE)) AS BIGINT) // 7 AS wk,
       |    CAST(sum(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS demand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY p_brand ORDER BY demand, wk) AS rn,
       |    count(*) OVER (PARTITION BY p_brand) AS cnt
       |  FROM weekly),
       |per AS (
       |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_weeks,
       |    CAST(sum(demand) AS BIGINT) AS tot,
       |    max(CASE WHEN rn = (8 * cnt + 9) // 10 THEN demand END) AS stock,
       |    max(CASE WHEN rn = (cnt + 1) // 2 THEN demand END) AS p50
       |  FROM r GROUP BY 1),
       |svc AS (
       |  SELECT weekly.p_brand,
       |    CAST(sum(CASE WHEN demand <= stock THEN 1 ELSE 0 END) AS BIGINT) AS wk_cov
       |  FROM weekly JOIN per ON weekly.p_brand = per.p_brand
       |  GROUP BY 1)
       |SELECT per.p_brand AS brand, n_weeks,
       |  CAST(tot AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS mean_weekly,
       |  CAST(p50 AS BIGINT) AS p50_demand,
       |  CAST(stock AS BIGINT) AS stock_level,
       |  CAST(wk_cov AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS service_level
       |FROM per JOIN svc ON per.p_brand = svc.p_brand
       |ORDER BY brand""".stripMargin

  // ------------------------------------------------------ mahalanobis_outliers

  private val MahalanobisTopK = 20
  // χ²(df=2, 0.95) — the standard 2-feature outlier cut
  private val MahalanobisCut = "5.99"

  /** Top-20 multivariate order outliers by Mahalanobis distance over
    * (order value in kilodollars, line count) — the correlation-aware
    * outlier score the univariate detectors (`anomaly_zscore`,
    * `anomaly_mad`, `iqr_outliers`) can't give: a 6-line order at a
    * 1-line price is extreme even when both marginals are ordinary.
    * Covariance from exact integer moments (kilodollar units keep
    * every product far under 2⁵³ at any realistic SF), 2×2 inverse in
    * closed form, d² per order as one fixed-form shared expression;
    * ties broken by order key, so the top-20 hash-matches.
    *
    * Scale shape: lineitem partial-aggregates to order grain and
    * joins orders on the key; the 1-row moment frame broadcasts back
    * over the order frame map-side; top-20 is a distributed
    * TakeOrdered, never a global sort.
    */
  def mahalanobisOutliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perOrder = graft.core.OwnedCaches.own(t.orders
      .select(col("o_orderkey"),
        expr("CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 1000) AS BIGINT)").as("x1"))
      .join(t.lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("x2")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("x1"), col("x2"))
      .cache())
    val mom = perOrder.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
      sum(expr("x1 * x2")).as("s12"))
    val fit = MahalanobisStages.foldLeft(mom) { (df, st) =>
      df.selectExpr(("*" +: st): _*)
    }.select("m1", "m2", "c11", "c22", "c12", "det")
    perOrder.crossJoin(broadcast(fit))
      .selectExpr("o_orderkey", "x1 AS total_kdollars", "x2 AS n_lines",
        s"""CASE WHEN det = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
           |ELSE (c22 * (CAST(x1 AS DOUBLE) - m1) * (CAST(x1 AS DOUBLE) - m1)
           |  - CAST(2 AS DOUBLE) * c12 * (CAST(x1 AS DOUBLE) - m1) * (CAST(x2 AS DOUBLE) - m2)
           |  + c11 * (CAST(x2 AS DOUBLE) - m2) * (CAST(x2 AS DOUBLE) - m2)) / det END AS d2""".stripMargin)
      .withColumn("is_outlier",
        expr(s"CASE WHEN d2 > CAST($MahalanobisCut AS DOUBLE) THEN 1 ELSE 0 END"))
      .orderBy(col("d2").desc, col("o_orderkey"))
      .limit(MahalanobisTopK)
  }

  private val MahalanobisStages: Seq[Seq[String]] = {
    def d(s: String) = s"CAST($s AS DOUBLE)"
    Seq(
      Seq(s"${d("s1")} / ${d("n")} AS m1", s"${d("s2")} / ${d("n")} AS m2",
        s"""CASE WHEN n <= 1 THEN CAST(0 AS DOUBLE)
           |ELSE (${d("s11")} - ${d("s1")} * ${d("s1")} / ${d("n")}) / ${d("n - 1")} END AS c11""".stripMargin,
        s"""CASE WHEN n <= 1 THEN CAST(0 AS DOUBLE)
           |ELSE (${d("s22")} - ${d("s2")} * ${d("s2")} / ${d("n")}) / ${d("n - 1")} END AS c22""".stripMargin,
        s"""CASE WHEN n <= 1 THEN CAST(0 AS DOUBLE)
           |ELSE (${d("s12")} - ${d("s1")} * ${d("s2")} / ${d("n")}) / ${d("n - 1")} END AS c12""".stripMargin),
      Seq("c11 * c22 - c12 * c12 AS det"))
  }

  val mahalanobisOutliersSql: String = {
    val ctes = MahalanobisStages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) "mom" else s"f$i"
      s"f${i + 1} AS (SELECT *,\n    ${st.mkString(",\n    ")}\n  FROM $from)"
    }.mkString(",\n")
    s"""WITH per_order AS (
       |  SELECT o_orderkey,
       |    CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) / 1000) AS BIGINT) AS x1,
       |    CAST(lc.x2 AS BIGINT) AS x2
       |  FROM orders JOIN (
       |    SELECT l_orderkey, count(*) AS x2 FROM lineitem GROUP BY 1) lc
       |  ON o_orderkey = l_orderkey),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x2 * x2) AS BIGINT) AS s22,
       |    CAST(sum(x1 * x2) AS BIGINT) AS s12
       |  FROM per_order),
       |$ctes,
       |fit AS (SELECT m1, m2, c11, c22, c12, det FROM f${MahalanobisStages.size}),
       |scored AS (
       |  SELECT o_orderkey, x1 AS total_kdollars, x2 AS n_lines,
       |    CASE WHEN det = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
       |    ELSE (c22 * (CAST(x1 AS DOUBLE) - m1) * (CAST(x1 AS DOUBLE) - m1)
       |      - CAST(2 AS DOUBLE) * c12 * (CAST(x1 AS DOUBLE) - m1) * (CAST(x2 AS DOUBLE) - m2)
       |      + c11 * (CAST(x2 AS DOUBLE) - m2) * (CAST(x2 AS DOUBLE) - m2)) / det END AS d2
       |  FROM per_order, fit)
       |SELECT o_orderkey, total_kdollars, n_lines, d2,
       |  CASE WHEN d2 > CAST($MahalanobisCut AS DOUBLE) THEN 1 ELSE 0 END AS is_outlier
       |FROM scored ORDER BY d2 DESC, o_orderkey LIMIT $MahalanobisTopK""".stripMargin
  }

  // ------------------------------------------------------ rank_biased_overlap

  private val RboDepth = 10
  private val RboP = 0.9

  /** Rank-biased overlap (Webber et al.) between the brand ranking
    * by revenue and by unit volume, truncated at depth 10 — the
    * top-weighted ranking-agreement measure for comparing two
    * leaderboards that `spearman_corr`/`kendall_tau` (whole-list,
    * uniform-weight) aren't: RBO discounts depth d by p^(d−1), so
    * disagreement at rank 1 costs more than at rank 10. Both
    * rankings are exact-decimal row_numbers; per-depth agreement
    * |S_d∩T_d|/d is an exact count over doubles; the geometric
    * weights are precomputed shortest-round-trip literals; rbo_at_10
    * reduces via the round-to-decimal sum — every row hash-matches.
    *
    * Scale shape: ONE lineitem pass with the part dim broadcast
    * reduces to the ≤|brands| spine; both rank windows and the
    * depth-spine join run on bounded frames only.
    */
  def rankBiasedOverlap(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val byBrand = t.lineitem
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum((money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))).as("rev"),
        sum(col("l_quantity").cast("decimal(18,0)")).as("qty"))
    val ranked = byBrand
      .withColumn("rs", row_number().over(Window.orderBy(col("rev").desc, col("p_brand"))))
      .withColumn("rt", row_number().over(Window.orderBy(col("qty").desc, col("p_brand"))))
    val weights = RboWeights.map { case (dd, w) => s"($dd, CAST($w AS DOUBLE))" }
      .mkString(", ")
    val spine = spark.sql(s"SELECT d, w FROM VALUES $weights AS v(d, w)")
    spine.join(ranked, col("rs") <= col("d") && col("rt") <= col("d"), "left")
      .groupBy(col("d"), col("w"))
      .agg(count(col("p_brand")).as("overlap"))
      .withColumn("agreement", expr("CAST(overlap AS DOUBLE) / CAST(d AS DOUBLE)"))
      .withColumn("term", expr("w * agreement"))
      .withColumn("rbo", sum(expr("CAST(round(term, 9) AS DECIMAL(18,9))"))
        .over(Window.partitionBy()))
      .selectExpr("CAST(d AS BIGINT) AS depth", "CAST(overlap AS BIGINT) AS overlap",
        "agreement", "w AS weight", "term", "CAST(rbo AS DOUBLE) AS rbo_at_10")
      .orderBy("depth")
  }

  // (d, (1−p)·p^(d−1)) as shortest-round-trip literals shared by both
  // engine texts
  private val RboWeights: Seq[(Int, String)] =
    (1 to RboDepth).map(dd => (dd, ((1.0 - RboP) * math.pow(RboP, dd - 1)).toString))

  val rankBiasedOverlapSql: String = {
    val weights = RboWeights.map { case (dd, w) => s"($dd, CAST($w AS DOUBLE))" }
      .mkString(", ")
    s"""WITH by_brand AS (
       |  SELECT p_brand,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
       |    sum(CAST(l_quantity AS DECIMAL(18,0))) AS qty
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1),
       |ranked AS (
       |  SELECT p_brand,
       |    row_number() OVER (ORDER BY rev DESC, p_brand) AS rs,
       |    row_number() OVER (ORDER BY qty DESC, p_brand) AS rt
       |  FROM by_brand),
       |spine AS (SELECT * FROM (VALUES $weights) AS v(d, w)),
       |g AS (
       |  SELECT d, w, CAST(count(p_brand) AS BIGINT) AS overlap
       |  FROM spine LEFT JOIN ranked ON rs <= d AND rt <= d
       |  GROUP BY 1, 2),
       |a AS (
       |  SELECT *, CAST(overlap AS DOUBLE) / CAST(d AS DOUBLE) AS agreement
       |  FROM g),
       |tm AS (SELECT *, w * agreement AS term FROM a),
       |s AS (SELECT *,
       |    sum(CAST(round(term, 9) AS DECIMAL(18,9))) OVER () AS rbo
       |  FROM tm)
       |SELECT CAST(d AS BIGINT) AS depth, overlap, agreement, w AS weight, term,
       |  CAST(rbo AS DOUBLE) AS rbo_at_10
       |FROM s ORDER BY depth""".stripMargin
  }

  // ------------------------------------------------------------- inventory_eoq

  /** Economic order quantity per brand: EOQ = √(2·D·S/H) with annual
    * demand D from the observed span, a fixed $100 ordering cost, and
    * holding cost H = 20% of the brand's average unit price — the
    * order-sizing companion to `inventory_reorder_point` (WHEN to
    * reorder) and `newsvendor_stock` (how much under uncertainty):
    * EOQ answers HOW MUCH per order under deterministic demand.
    * Demand/revenue stay exact integers to the division; the formula
    * is one fixed-order IEEE expression with rational-cast constants.
    *
    * Scale shape: one lineitem pass with a broadcast part join
    * partial-aggregates to the brand spine; the formula is per-row
    * scalar on ~25 rows.
    */
  def inventoryEoq(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("CAST(l_quantity AS DECIMAL(18,0))").as("q"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2)) * 100").as("revc"),
        expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").as("m"))
    val span = li.agg((max(col("m")) - min(col("m")) + 1).as("months"))
    li.groupBy(col("p_brand"))
      .agg(expr("CAST(sum(q) AS BIGINT)").as("qty"),
        expr("CAST(sum(revc) AS BIGINT)").as("revc"))
      .crossJoin(broadcast(span))
      .selectExpr("p_brand AS brand", "CAST(qty AS BIGINT) AS total_qty",
        "CAST(months AS BIGINT) AS n_months",
        s"$EoqD AS annual_demand", s"$EoqPrice AS avg_unit_price",
        s"$EoqExpr AS eoq_units",
        s"""CASE WHEN $EoqExpr = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
           |ELSE $EoqD / $EoqExpr END AS orders_per_year""".stripMargin)
      .orderBy("brand")
  }

  // D = qty·12/months; price = rev_cents/qty/100 dollars; H = 0.2·price;
  // EOQ = sqrt(2·D·100/H) — all rational casts, engine-identical
  private val EoqD =
    "(CAST(qty AS DOUBLE) * CAST(12 AS DOUBLE) / CAST(months AS DOUBLE))"
  private val EoqPrice =
    "(CAST(revc AS DOUBLE) / CAST(qty AS DOUBLE) / CAST(100 AS DOUBLE))"
  private val EoqExpr =
    s"(CASE WHEN $EoqPrice <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE) " +
      s"ELSE sqrt(CAST(2 AS DOUBLE) * $EoqD * CAST(100 AS DOUBLE) / " +
      s"(CAST(0.2 AS DOUBLE) * $EoqPrice)) END)"

  val inventoryEoqSql: String =
    s"""WITH li AS (
       |  SELECT p_brand,
       |    CAST(l_quantity AS DECIMAL(18,0)) AS q,
       |    CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS revc,
       |    year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |span AS (SELECT CAST(max(m) - min(m) + 1 AS BIGINT) AS months FROM li),
       |g AS (
       |  SELECT p_brand, CAST(sum(q) AS BIGINT) AS qty,
       |    CAST(sum(revc) AS BIGINT) AS revc
       |  FROM li GROUP BY 1)
       |SELECT p_brand AS brand, qty AS total_qty, months AS n_months,
       |  $EoqD AS annual_demand, $EoqPrice AS avg_unit_price,
       |  $EoqExpr AS eoq_units,
       |  CASE WHEN $EoqExpr = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
       |  ELSE $EoqD / $EoqExpr END AS orders_per_year
       |FROM g, span ORDER BY brand""".stripMargin
}
