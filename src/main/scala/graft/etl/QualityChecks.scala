package graft.etl

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Categorical-column profile: distinct count, Gini impurity
    * (1 − Σp² — the concentration measure that stays EXACT in pure
    * rational arithmetic; `shannon_entropy_profile` adds the
    * logarithmic twin via the engine-exact
    * [[graft.functions.ExactLn]]), and the top value's share, for
    * the order log's categorical columns. The dbt-style "profile your staging table"
    * report, numeric enough to alert on (a column collapsing to one
    * value → gini → 0).
    *
    * Scale shape: ONE scan — the columns unpivot map-side (2× bounded
    * fan-out) into (column, value) rows and a single partial-agg
    * count feeds every statistic; Σc² stays under 2^53 through 10⁸⁺
    * rows per value class, and all three stats are int/int division
    * chains — bit-reproducible.
    */
  def giniProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).orders
      .select(explode(map(
        lit("o_orderstatus"), col("o_orderstatus"),
        lit("o_orderpriority"), col("o_orderpriority"))).as(Seq("col_name", "val")))
      .groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("c")).as("__n"),
        sum(col("c") * col("c")).as("__ss"),
        max(col("c")).as("__mx"))
      .select(col("col_name"), col("n_distinct"),
        (lit(1.0) - col("__ss").cast("double") /
          (col("__n") * col("__n")).cast("double")).as("gini"),
        (col("__mx").cast("double") / col("__n").cast("double")).as("top_share"))
      .orderBy("col_name")
  }

  val giniProfileSql: String =
    """WITH u AS (
      |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', o_orderpriority FROM orders),
      |counts AS (SELECT col_name, val, count(*) AS c FROM u GROUP BY 1, 2),
      |agg AS (
      |  SELECT col_name, count(*) AS n_distinct,
      |    CAST(sum(c) AS BIGINT) AS n, CAST(sum(c*c) AS BIGINT) AS ss,
      |    CAST(max(c) AS BIGINT) AS mx
      |  FROM counts GROUP BY 1)
      |SELECT col_name, n_distinct,
      |  CAST(1 AS DOUBLE) - CAST(ss AS DOUBLE) / CAST(n*n AS DOUBLE) AS gini,
      |  CAST(mx AS DOUBLE) / CAST(n AS DOUBLE) AS top_share
      |FROM agg ORDER BY col_name""".stripMargin

  // ------------------------------------------------- shannon_entropy_profile

  /** Shannon entropy (nats) of the order log's categorical columns —
    * `gini_profile`'s information-theoretic twin, unreachable until
    * the engine-exact [[graft.functions.ExactLn]] landed (libm `ln`
    * rounds differently on the two engines; this one is bit-exact by
    * construction). Reports raw entropy and the [0,1]-normalized
    * H/ln(k) evenness score monitoring alerts on: a column collapsing
    * toward one value drives evenness → 0 long before distinct-count
    * changes. Per-value contributions −p·ln p reduce order-
    * independently via the round-to-decimal sum; ln arguments
    * p ≥ 1/n stay in ExactLn's domain through n = 2⁴⁰ rows.
    *
    * Scale shape: same as `gini_profile` — ONE scan, map-side 2×
    * bounded unpivot, a single partial-agg count per (column, value),
    * then per-column reduction over value cardinality.
    */
  def shannonEntropyProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    val counts = Tables(spark, dir).orders
      .select(explode(map(
        lit("o_orderstatus"), col("o_orderstatus"),
        lit("o_orderpriority"), col("o_orderpriority"))).as(Seq("col_name", "val")))
      .groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("col_name")))
      .withColumn("p", expr("CAST(c AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("__y", expr(ExactLn.yExpr("p")))
      .withColumn("__z", expr(ExactLn.zExpr("__y")))
      .withColumn("contrib", expr(s"-(p * ${ExactLn.lnExpr("__z")})"))
    counts.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(expr("CAST(round(contrib, 9) AS DECIMAL(18,9))")).as("hd"))
      .withColumn("kd", expr("CAST(n_distinct AS DOUBLE)"))
      .withColumn("__yk", expr(ExactLn.yExpr("kd")))
      .withColumn("__zk", expr(ExactLn.zExpr("__yk")))
      .selectExpr("col_name", "CAST(n_distinct AS BIGINT) AS n_distinct",
        "CAST(hd AS DOUBLE) AS entropy_nats",
        "CASE WHEN n_distinct = 1 THEN CAST(0 AS DOUBLE) " +
          s"ELSE CAST(hd AS DOUBLE) / ${ExactLn.lnExpr("__zk")} END AS evenness")
      .orderBy("col_name")
  }

  val shannonEntropyProfileSql: String = {
    import graft.functions.ExactLn
    s"""WITH u AS (
       |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
       |  UNION ALL
       |  SELECT 'o_orderpriority', o_orderpriority FROM orders),
       |counts AS (SELECT col_name, val, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
       |t AS (
       |  SELECT *, sum(c) OVER (PARTITION BY col_name) AS n FROM counts),
       |p AS (SELECT *, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM t),
       |y AS (SELECT *, ${ExactLn.yExpr("p")} AS __y FROM p),
       |z AS (SELECT *, ${ExactLn.zExpr("__y")} AS __z FROM y),
       |x AS (SELECT *, -(p * ${ExactLn.lnExpr("__z")}) AS contrib FROM z),
       |g AS (
       |  SELECT col_name, CAST(count(*) AS BIGINT) AS n_distinct,
       |    sum(CAST(round(contrib, 9) AS DECIMAL(18,9))) AS hd
       |  FROM x GROUP BY 1),
       |k AS (SELECT *, CAST(n_distinct AS DOUBLE) AS kd FROM g),
       |yk AS (SELECT *, ${ExactLn.yExpr("kd")} AS __yk FROM k),
       |zk AS (SELECT *, ${ExactLn.zExpr("__yk")} AS __zk FROM yk)
       |SELECT col_name, n_distinct,
       |  CAST(hd AS DOUBLE) AS entropy_nats,
       |  CASE WHEN n_distinct = 1 THEN CAST(0 AS DOUBLE)
       |    ELSE CAST(hd AS DOUBLE) / ${ExactLn.lnExpr("__zk")} END AS evenness
       |FROM zk ORDER BY col_name""".stripMargin
  }

  private val DriftBins = 10

  /** Distribution drift monitor (PSI-style): split the order log at
    * its temporal midpoint into a reference and a current period, bin
    * `o_totalprice` into 10 equal-width bins over the GLOBAL range,
    * and report per-bin counts, per-period shares, and the share
    * shift — the table a pipeline alarms on when yesterday's data
    * stops looking like last month's. (The PSI scalar itself is
    * `psi_drift` (Stats.psiDrift), computable since the engine-exact
    * [[graft.functions.ExactLn]] landed; this per-bin share-shift
    * table remains the pure-rational view a consumer can fold with
    * whatever weighting it wants.)
    *
    * Scale shape: one tiny min/max/midpoint aggregate broadcast back,
    * then ONE conditional-aggregation scan produces both periods'
    * bins — never two passes over the log. All ratios are int/int
    * single divisions and the shift is one double subtraction, so
    * every output cell is bit-reproducible in the oracle.
    */
  def distDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_totalprice").as("v"))
    // integer `div` on both sides — a double /2 + cast would TRUNCATE
    // in Spark but ROUND in DuckDB on odd epoch sums
    val bounds = o.agg(
      min(col("v")).as("lo"), max(col("v")).as("hi"),
      expr("(min(t) + max(t)) div 2").as("mid"))
    val binned = o.crossJoin(broadcast(bounds))
      .select(
        when(col("hi") === col("lo"), 0)
          .otherwise(least(
            floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / lit(DriftBins.toDouble))).cast("int"),
            lit(DriftBins - 1))).as("bin"),
        (col("t") <= col("mid")).as("is_ref"))
      .groupBy(col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_cnt"))
      // referenced twice below (totals + output) — Catalyst duplicates
      // unaliased subtrees, so an uncached frame would scan orders twice
      .cache()
    graft.core.OwnedCaches.own(binned)
    val totals = binned.agg(sum(col("ref_cnt")).as("__rt"), sum(col("cur_cnt")).as("__ct"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        (col("ref_cnt").cast("double") / col("__rt").cast("double")).as("ref_pct"),
        (col("cur_cnt").cast("double") / col("__ct").cast("double")).as("cur_pct"))
      .withColumn("shift_pct", col("cur_pct") - col("ref_pct"))
      .orderBy("bin")
  }

  val distDriftSql: String =
    s"""WITH o AS (SELECT epoch_us(o_orderdate) AS t, o_totalprice AS v FROM orders),
      |b AS (SELECT min(v) AS lo, max(v) AS hi,
      |             (min(t) + max(t)) // 2 AS mid FROM o),
      |h AS (SELECT CAST(CASE WHEN hi = lo THEN 0
      |        ELSE least(CAST(floor((v - lo) / ((hi - lo) / ${DriftBins.toDouble})) AS INTEGER), ${DriftBins - 1}) END AS INTEGER) AS bin,
      |        t <= mid AS is_ref
      |      FROM o, b),
      |g AS (SELECT bin,
      |        CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
      |        CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt
      |      FROM h GROUP BY bin),
      |tt AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS rt, CAST(sum(cur_cnt) AS BIGINT) AS ct FROM g)
      |SELECT bin, ref_cnt, cur_cnt,
      |  CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE) AS ref_pct,
      |  CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE) AS cur_pct,
      |  CAST(cur_cnt AS DOUBLE) / CAST(ct AS DOUBLE)
      |    - CAST(ref_cnt AS DOUBLE) / CAST(rt AS DOUBLE) AS shift_pct
      |FROM g, tt ORDER BY bin""".stripMargin

  // ----------------------------------------------------- orphaned_dimensions

  /** Referential-integrity profile from the FACT side: dimension rows
    * no fact ever references (parts never ordered, customers who
    * never ordered, suppliers who never shipped) — the dead-inventory
    * / dormant-entity audit that complements `data_quality_summary`'s
    * orphaned-FK direction (facts pointing at missing dims). One row
    * per dimension with exact orphan share.
    *
    * Scale shape: each fact side partial-aggregates to DISTINCT keys
    * before the anti join (the join probes dim-sized, never
    * fact-sized frames); three tiny audits union into one frame.
    */
  def orphanedDimensions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(entity: String, dim: DataFrame, key: String,
        factKeys: DataFrame): DataFrame = {
      // one scalar action per dim (the pagerank pulled-constant
      // convention); dims are the small side by definition
      val total = dim.count()
      dim.join(factKeys, dim(key) === factKeys(factKeys.columns.head), "left_anti")
        .agg(count(lit(1)).as("n_orphaned"))
        .select(lit(entity).as("entity"), lit(total).as("n_total"),
          col("n_orphaned"),
          expr(s"CAST(n_orphaned AS DOUBLE) / CAST(${total}L AS DOUBLE)").as("orphan_share"))
    }
    val parts = audit("part", t.part.select(col("p_partkey")), "p_partkey",
      t.lineitem.select(col("l_partkey")).distinct())
    val custs = audit("customer", t.customer.select(col("c_custkey")), "c_custkey",
      t.orders.select(col("o_custkey")).distinct())
    val supps = audit("supplier", t.supplier.select(col("s_suppkey")), "s_suppkey",
      t.lineitem.select(col("l_suppkey")).distinct())
    parts.unionByName(custs).unionByName(supps).orderBy("entity")
  }

  val orphanedDimensionsSql: String =
    """SELECT * FROM (
      |  SELECT 'customer' AS entity, CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total,
      |    CAST(count(*) AS BIGINT) AS n_orphaned,
      |    CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM customer) AS DOUBLE) AS orphan_share
      |  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |  UNION ALL
      |  SELECT 'part', CAST((SELECT count(*) FROM part) AS BIGINT), CAST(count(*) AS BIGINT),
      |    CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM part) AS DOUBLE)
      |  FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
      |  UNION ALL
      |  SELECT 'supplier', CAST((SELECT count(*) FROM supplier) AS BIGINT), CAST(count(*) AS BIGINT),
      |    CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM supplier) AS DOUBLE)
      |  FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem))
      |ORDER BY entity""".stripMargin

  // ------------------------------------------------------- scd2_conformance

  /** SCD2 integrity audit over the customer-state history: the four
    * invariants every slowly-changing-dimension consumer silently
    * assumes — exactly ONE open (is_current) row per key, validity
    * intervals neither overlapping nor gapped (valid_to = next
    * valid_from), and dense version numbers — each reported as a
    * violation count (all-zero on a healthy build; the dbt
    * relationship-test shape of this module applied to TEMPORAL
    * integrity, which the reference's schema tests don't cover). The
    * check recomputes from the published history frame, not from its
    * build internals, so a future scd2 refactor that breaks an
    * invariant is caught here even if its own tests pass.
    *
    * Scale shape: one lead-window pass over the key-partitioned
    * history + two key-grain partial aggs — the history's own
    * shuffle grain, nothing wider.
    */
  def scd2Conformance(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.etl.StarSchema.scd2History(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("customer_source_id").orderBy("version")
    val x = h.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
    val perKey = x.groupBy(col("customer_source_id"))
      .agg(count(lit(1)).as("n"), max(col("version")).as("maxv"),
        sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"),
        sum(when(col("valid_to_us").isNotNull && col("next_from").isNotNull &&
          col("valid_to_us") > col("next_from"), 1L).otherwise(0L)).as("n_olap"),
        sum(when(col("valid_to_us").isNotNull && col("next_from").isNotNull &&
          col("valid_to_us") < col("next_from"), 1L).otherwise(0L)).as("n_gap"))
    perKey.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        sum(when(col("n_open") =!= 1L, 1L).otherwise(0L)).as("open_row_violations"),
        sum(col("n_olap")).as("overlap_violations"),
        sum(col("n_gap")).as("gap_violations"),
        sum(when(col("maxv").cast("long") =!= col("n"), 1L).otherwise(0L))
          .as("version_density_violations"))
      .selectExpr("CAST(n_keys AS BIGINT) AS n_keys",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(open_row_violations AS BIGINT) AS open_row_violations",
        "CAST(overlap_violations AS BIGINT) AS overlap_violations",
        "CAST(gap_violations AS BIGINT) AS gap_violations",
        "CAST(version_density_violations AS BIGINT) AS version_density_violations")
  }

  lazy val scd2ConformanceSql: String =
    s"""WITH hist AS (${graft.etl.StarSchema.scd2HistorySql}),
       |x AS (
       |  SELECT *,
       |    lead(valid_from_us) OVER (PARTITION BY customer_source_id ORDER BY version) AS next_from
       |  FROM hist),
       |pk AS (
       |  SELECT customer_source_id, CAST(count(*) AS BIGINT) AS n,
       |    CAST(max(version) AS BIGINT) AS maxv,
       |    CAST(sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       |    CAST(sum(CASE WHEN valid_to_us IS NOT NULL AND next_from IS NOT NULL
       |      AND valid_to_us > next_from THEN 1 ELSE 0 END) AS BIGINT) AS n_olap,
       |    CAST(sum(CASE WHEN valid_to_us IS NOT NULL AND next_from IS NOT NULL
       |      AND valid_to_us < next_from THEN 1 ELSE 0 END) AS BIGINT) AS n_gap
       |  FROM x GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN n_open != 1 THEN 1 ELSE 0 END) AS BIGINT) AS open_row_violations,
       |  CAST(sum(n_olap) AS BIGINT) AS overlap_violations,
       |  CAST(sum(n_gap) AS BIGINT) AS gap_violations,
       |  CAST(sum(CASE WHEN maxv != n THEN 1 ELSE 0 END) AS BIGINT) AS version_density_violations
       |FROM pk""".stripMargin

  // ------------------------------------------------------ partition_freshness

  /** Per-day partition freshness report over the event log: row and
    * user volume per event-date partition plus its lag (in days)
    * behind the newest partition — the "is the feed current, and did
    * yesterday's load arrive at full volume" table a warehouse
    * freshness monitor pages on (the reference's stage-5/6 loads run
    * on exactly this partition grain;
    * `trigger_bigquery_load.py` / `main_flow.py` schedule by it).
    * Complements `data_quality_summary` (field-level validity) and
    * `orphaned_dimensions` (referential integrity) with the
    * TEMPORAL completeness axis. Day arithmetic is exact integer
    * date-diff; days render as ISO strings (the cross-engine date
    * convention).
    *
    * Scale shape: one partial-agg pass reduces the log to the
    * calendar-bounded day frame (count + per-day exact distinct over
    * the day-partitioned shuffle); the max-day scalar broadcasts
    * back. At 100 TB the date partition IS the physical layout, so
    * the "scan" is metadata-cheap per partition.
    */
  def partitionFreshness(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(timestamp_micros(col("ts_us")).cast("date").as("d"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val dmax = daily.agg(max(col("d")).as("dmax"))
    daily.crossJoin(broadcast(dmax))
      .select(col("d").cast("string").as("day"),
        col("n_events").cast("long").as("n_events"),
        col("n_users").cast("long").as("n_users"),
        datediff(col("dmax"), col("d")).cast("int").as("lag_days"))
      .orderBy("day")
  }

  val partitionFreshnessSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events GROUP BY 1),
      |mx AS (SELECT max(d) AS dmax FROM daily)
      |SELECT CAST(d AS VARCHAR) AS day, n_events, n_users,
      |  CAST(dmax - d AS INTEGER) AS lag_days
      |FROM daily, mx ORDER BY day""".stripMargin

  // --------------------------------------------------------- k_anonymity_audit

  /** k-anonymity audit of the customer dim under the
    * (nation, market segment) quasi-identifier: equivalence-class
    * size bands, how many customers sit in classes smaller than the
    * k=5 / k=10 conventions, and each band's share — the
    * re-identification exposure readout a privacy review wants
    * BEFORE an export (none of the data-quality checks measure
    * linkability). Pure integer counting; shares are guarded
    * cast-each-operand doubles.
    *
    * Scale shape: one partial-aggregating pass to the QI-class frame
    * (bounded by |nations|·|segments|), a second to the 4-row band
    * spine; the share window runs on that spine only.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val classes = Tables(spark, dir).customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("k"))
    classes
      .withColumn("band", expr(KAnonBandCase))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_customers"),
        min(col("k")).as("min_k"))
      .withColumn("tot", sum(col("n_customers")).over(Window.partitionBy()))
      .selectExpr("band", "CAST(n_classes AS BIGINT) AS n_classes",
        "CAST(n_customers AS BIGINT) AS n_customers",
        "CAST(min_k AS BIGINT) AS min_k",
        "CAST(n_customers AS DOUBLE) / CAST(tot AS DOUBLE) AS share_customers")
      .orderBy("band")
  }

  private val KAnonBandCase: String =
    """CASE WHEN k = 1 THEN '1_unique' WHEN k < 5 THEN '2_to_4'
      |WHEN k < 10 THEN '5_to_9' ELSE '10_plus' END""".stripMargin

  val kAnonymityAuditSql: String =
    s"""WITH classes AS (
       |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
       |  FROM customer GROUP BY 1, 2),
       |b AS (
       |  SELECT $KAnonBandCase AS band,
       |    CAST(count(*) AS BIGINT) AS n_classes,
       |    CAST(sum(k) AS BIGINT) AS n_customers,
       |    CAST(min(k) AS BIGINT) AS min_k
       |  FROM classes GROUP BY 1),
       |t AS (SELECT *, CAST(sum(n_customers) OVER () AS BIGINT) AS tot FROM b)
       |SELECT band, n_classes, n_customers, min_k,
       |  CAST(n_customers AS DOUBLE) / CAST(tot AS DOUBLE) AS share_customers
       |FROM t ORDER BY band""".stripMargin

  // ------------------------------------------------ mutual_information_matrix

  // MI cell term p·ln((c·n)/(cx·cy)) and margin-entropy term −p·ln p,
  // both on fixed-order cast-each-operand doubles with the engine-
  // exact ln staged, each Σ term 9-dp decimal-quantized (the repo's
  // order-independent-sum convention). Ratio ≥ 1/n keeps ExactLn in
  // domain for n < 2⁴⁰.
  private val MiRatio =
    "((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))"
  private val MiTerm =
    "CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * __ln, 9) AS DECIMAL(18,9))"
  private val MarP = "(CAST(cm AS DOUBLE) / CAST(n AS DOUBLE))"
  private val MarTerm =
    s"CAST(round(-($MarP * __ln), 9) AS DECIMAL(18,9))"

  /** Mutual information (nats) between categorical column pairs of
    * the orders feed — status×priority, status×weekday,
    * priority×weekday — with each column's marginal entropy and the
    * normalized MI/min(H) coefficient: `chi_square_profile` /
    * `cramers_v` measure ASSOCIATION on the χ² scale; MI measures it
    * in BITS-equivalent (how much knowing one column shrinks the
    * other's entropy), the number feature selection and leakage
    * review actually rank by. Cell and margin counts are exact; both
    * logs are the engine-exact [[graft.functions.ExactLn]]
    * construction; every Σ is over 9-dp-quantized decimals.
    *
    * Scale shape: one orders pass fans into three (pair, va, vb)
    * streams that partial-aggregate to domain-bounded cell frames
    * (≤ |status|·|priority| etc.); margins, entropies and MI all run
    * on those bounded spines.
    */
  def mutualInformationMatrix(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    val base = Tables(spark, dir).orders.select(
      col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"),
      expr("CAST(CAST(datediff(CAST(o_orderdate AS DATE), DATE'1990-01-01') AS BIGINT) % 7 AS STRING)").as("wd"))
    val u = base.selectExpr("'status_priority' AS pair", "st AS va", "pr AS vb")
      .unionByName(base.selectExpr("'status_weekday' AS pair", "st AS va", "wd AS vb"))
      .unionByName(base.selectExpr("'priority_weekday' AS pair", "pr AS va", "wd AS vb"))
    val cells = u.groupBy(col("pair"), col("va"), col("vb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cx", sum(col("c")).over(Window.partitionBy("pair", "va")))
      .withColumn("cy", sum(col("c")).over(Window.partitionBy("pair", "vb")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("pair")))
    val mi = cells
      .withColumn("__y", expr(ExactLn.yExpr(MiRatio)))
      .withColumn("__z", expr(ExactLn.zExpr("__y")))
      .withColumn("__ln", expr(ExactLn.lnExpr("__z")))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_cells"), sum(expr(MiTerm)).as("mi"))
    def marginEntropy(key: String, out: String): DataFrame = cells
      .groupBy(col("pair"), col(key))
      .agg(sum(col("c")).as("cm"), max(col("n")).as("n"))
      .withColumn("__y", expr(ExactLn.yExpr(MarP)))
      .withColumn("__z", expr(ExactLn.zExpr("__y")))
      .withColumn("__ln", expr(ExactLn.lnExpr("__z")))
      .groupBy(col("pair")).agg(sum(expr(MarTerm)).as(out))
    mi.join(marginEntropy("va", "ha"), "pair")
      .join(marginEntropy("vb", "hb"), "pair")
      .selectExpr("pair", "CAST(n_cells AS BIGINT) AS n_cells",
        "CAST(mi AS DOUBLE) AS mi_nats",
        "CAST(ha AS DOUBLE) AS h_a", "CAST(hb AS DOUBLE) AS h_b",
        """CASE WHEN CAST(least(ha, hb) AS DOUBLE) <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
          |ELSE CAST(mi AS DOUBLE) / CAST(least(ha, hb) AS DOUBLE) END AS nmi""".stripMargin)
      .orderBy("pair")
  }

  val mutualInformationMatrixSql: String = {
    import graft.functions.ExactLn
    def marginCtes(key: String, tag: String, out: String): String =
      s"""m$tag AS (
         |  SELECT pair, $key, CAST(sum(c) AS BIGINT) AS cm, CAST(max(n) AS BIGINT) AS n
         |  FROM cells GROUP BY 1, 2),
         |m${tag}y AS (SELECT pair, cm, n, ${ExactLn.yExpr(MarP)} AS __y FROM m$tag),
         |m${tag}z AS (SELECT *, ${ExactLn.zExpr("__y")} AS __z FROM m${tag}y),
         |m${tag}l AS (SELECT *, ${ExactLn.lnExpr("__z")} AS __ln FROM m${tag}z),
         |h$tag AS (SELECT pair, sum($MarTerm) AS $out FROM m${tag}l GROUP BY 1)""".stripMargin
    s"""WITH base AS (
       |  SELECT o_orderstatus AS st, o_orderpriority AS pr,
       |    CAST(CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) % 7 AS VARCHAR) AS wd
       |  FROM orders),
       |u AS (
       |  SELECT 'status_priority' AS pair, st AS va, pr AS vb FROM base
       |  UNION ALL SELECT 'status_weekday', st, wd FROM base
       |  UNION ALL SELECT 'priority_weekday', pr, wd FROM base),
       |cells AS (
       |  SELECT pair, va, vb, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(count(*)) OVER (PARTITION BY pair, va) AS BIGINT) AS cx,
       |    CAST(sum(count(*)) OVER (PARTITION BY pair, vb) AS BIGINT) AS cy,
       |    CAST(sum(count(*)) OVER (PARTITION BY pair) AS BIGINT) AS n
       |  FROM u GROUP BY 1, 2, 3),
       |cy0 AS (SELECT pair, c, n, cx, cy, ${ExactLn.yExpr(MiRatio)} AS __y FROM cells),
       |cz AS (SELECT *, ${ExactLn.zExpr("__y")} AS __z FROM cy0),
       |cl AS (SELECT *, ${ExactLn.lnExpr("__z")} AS __ln FROM cz),
       |mi AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS n_cells, sum($MiTerm) AS mi
       |  FROM cl GROUP BY 1),
       |${marginCtes("va", "a", "ha")},
       |${marginCtes("vb", "b", "hb")}
       |SELECT mi.pair, n_cells, CAST(mi AS DOUBLE) AS mi_nats,
       |  CAST(ha AS DOUBLE) AS h_a, CAST(hb AS DOUBLE) AS h_b,
       |  CASE WHEN CAST(least(ha, hb) AS DOUBLE) <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(mi AS DOUBLE) / CAST(least(ha, hb) AS DOUBLE) END AS nmi
       |FROM mi JOIN ha USING (pair) JOIN hb USING (pair)
       |ORDER BY pair""".stripMargin
  }

  // ----------------------------------------------------------- dp_noisy_counts

  /** ε for the Laplace release (sensitivity 1 per-source doc counts ⇒
    * scale b = 1/ε).
    */
  private val DpEpsilon = 1.0

  /** The Laplace-mechanism computation shared by the release
    * ([[dpNoisyCounts]]) and the audit ([[dpReleaseAudit]]) — all
    * intermediate columns, never published as-is.
    */
  private def dpNoisyBody(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    Tables(spark, dir).documents
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("h", conv(substring(md5(concat(col("source"), lit("_dp"))), 1, 10), 16, 10)
        .cast("long"))
      .withColumn("t", expr(
        "(CAST(h AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1099511627776 AS DOUBLE)" +
          " - CAST(0.5 AS DOUBLE)"))
      .withColumn("a", expr(
        "CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * (CASE WHEN t < 0 THEN 0.0 - t ELSE t END)"))
      .withColumn("__y", expr(ExactLn.yExpr("a")))
      .withColumn("__z", expr(ExactLn.zExpr("__y")))
      .withColumn("noise", expr(
        s"(0.0 - (CAST(1 AS DOUBLE) / CAST($DpEpsilon AS DOUBLE)))" +
          s" * (CASE WHEN t < 0 THEN -1.0 ELSE 1.0 END) * (${ExactLn.lnExpr("__z")})"))
  }

  /** Differentially-private release of the per-source document counts
    * — the ε-DP Laplace mechanism with DETERMINISTIC inverse-CDF
    * sampling, the companion to [[kAnonymityAudit]]: k-anonymity says
    * which cells are safe to release raw; this is how the unsafe ones
    * get released anyway. noise = −b·sign(t)·ln(1−2|t|) with
    * t = u − ½ and u an md5-seeded uniform — the textbook Laplace
    * inverse CDF. The seed offset (h + ½)/2⁴⁰ keeps u strictly inside
    * (0,1) and t away from both 0 and ±½, so the ln argument is
    * always positive and the sign never degenerate.
    *
    * The RELEASE projection is (source, epsilon, noisy_count) ONLY
    * (round 17, ADVICE r16): publishing the raw count or the noise
    * alongside the noisy count would make the mechanism decorative.
    * Privacy caveat, stated not implied: with the md5 seed fixed and
    * public, anyone can re-derive the noise from the source name, so
    * THIS release carries no real ε guarantee — it is the mechanism's
    * bit-reproducible test face. A production release must draw the
    * uniform from a secret seed rotated per release; the ε=1 label
    * describes the mechanism's calibration, not a guarantee of this
    * fixed-seed instance. The raw-count/noise face lives in
    * [[dpReleaseAudit]], explicitly named as an audit.
    *
    * Scale shape: one map-side count groupBy to the source-bounded
    * frame; everything after runs on ≤ |sources| rows.
    */
  def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame =
    dpNoisyBody(spark, dir)
      .select(col("source"), lit(DpEpsilon).as("epsilon"),
        expr("CAST(n_docs AS DOUBLE) + noise").as("noisy_count"))
      .orderBy("source")

  /** AUDIT face of [[dpNoisyCounts]] — the raw count, the derived
    * noise, and the released value side by side, so the release can
    * be re-derived and verified end-to-end (deterministic seed ⇒ the
    * audit is reproducible). By construction this exposes everything
    * the release hides: run it where the raw counts are already
    * visible (the data owner's side), never publish it.
    */
  def dpReleaseAudit(spark: SparkSession, dir: String): DataFrame =
    dpNoisyBody(spark, dir)
      .select(col("source"), col("n_docs"),
        lit(DpEpsilon).as("epsilon"), col("noise"),
        expr("CAST(n_docs AS DOUBLE) + noise").as("noisy_count"))
      .orderBy("source")

  /** The shared Laplace-mechanism CTE chain (ends at CTE `n` with
    * n_docs/noise columns) — one text under both dp oracles.
    */
  private val dpNoisyCtes: String = {
    import graft.functions.ExactLn
    s"""c AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
       |h AS (
       |  SELECT *, ('0x' || substr(md5(source || '_dp'), 1, 10))::BIGINT AS h FROM c),
       |t AS (
       |  SELECT *,
       |    (CAST(h AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1099511627776 AS DOUBLE)
       |      - CAST(0.5 AS DOUBLE) AS t
       |  FROM h),
       |a AS (
       |  SELECT *,
       |    CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * (CASE WHEN t < 0 THEN 0.0 - t ELSE t END) AS a
       |  FROM t),
       |y AS (SELECT *, ${ExactLn.yExpr("a")} AS __y FROM a),
       |z AS (SELECT *, ${ExactLn.zExpr("__y")} AS __z FROM y),
       |n AS (
       |  SELECT *,
       |    (0.0 - (CAST(1 AS DOUBLE) / CAST($DpEpsilon AS DOUBLE)))
       |      * (CASE WHEN t < 0 THEN -1.0 ELSE 1.0 END) * (${ExactLn.lnExpr("__z")}) AS noise
       |  FROM z)""".stripMargin
  }

  val dpNoisyCountsSql: String =
    s"""WITH $dpNoisyCtes
       |SELECT source, CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  CAST(n_docs AS DOUBLE) + noise AS noisy_count
       |FROM n ORDER BY source""".stripMargin

  val dpReleaseAuditSql: String =
    s"""WITH $dpNoisyCtes
       |SELECT source, n_docs, CAST($DpEpsilon AS DOUBLE) AS epsilon, noise,
       |  CAST(n_docs AS DOUBLE) + noise AS noisy_count
       |FROM n ORDER BY source""".stripMargin

  // --------------------------------------------------- l_diversity_audit

  /** The fixed sensitive-attribute banding shared by the two privacy
    * audits: account balance in exact cents -> 4 ordered bands.
    */
  private val SensBandCase: String =
    """CASE WHEN ab < 0 THEN 0 WHEN ab < 250000 THEN 1
      |WHEN ab < 750000 THEN 2 ELSE 3 END""".stripMargin

  /** l-diversity audit over the [[kAnonymityAudit]] quasi-identifier
    * classes (nation x market segment): k-anonymity only bounds class
    * SIZE — a class of 50 customers who all share one account-balance
    * band is still fully disclosing. l = distinct sensitive bands
    * (exact-cents acctbal -> 4 fixed bands) per class; the histogram
    * of classes by l is the release gate's second dial. Pure integer
    * counting on a domain-bounded (<=125 class) grid.
    *
    * Scale shape: one customer-grain conditional-count pass to the
    * class x band grid, then class- and l-grain rollups of that
    * bounded frame.
    */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables(spark, dir).customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("ab"))
      .withColumn("band", expr(SensBandCase))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(countDistinct(col("band")).as("l"), count(lit(1)).as("k"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_customers"),
        min(col("k")).as("min_k"))
      .withColumn("tot", sum(col("n_customers")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .selectExpr("CAST(l AS BIGINT) AS l", "CAST(n_classes AS BIGINT) AS n_classes",
        "CAST(n_customers AS BIGINT) AS n_customers",
        "CAST(min_k AS BIGINT) AS min_k",
        "CAST(n_customers AS DOUBLE) / CAST(tot AS DOUBLE) AS share_customers")
      .orderBy("l")
  }

  val lDiversityAuditSql: String =
    s"""WITH cust AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS ab
       |  FROM customer),
       |b AS (SELECT c_nationkey, c_mktsegment, $SensBandCase AS band FROM cust),
       |classes AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(count(DISTINCT band) AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS k
       |  FROM b GROUP BY 1, 2),
       |g AS (
       |  SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
       |    CAST(sum(k) AS BIGINT) AS n_customers, CAST(min(k) AS BIGINT) AS min_k
       |  FROM classes GROUP BY 1),
       |t AS (SELECT *, CAST(sum(n_customers) OVER () AS BIGINT) AS tot FROM g)
       |SELECT l, n_classes, n_customers, min_k,
       |  CAST(n_customers AS DOUBLE) / CAST(tot AS DOUBLE) AS share_customers
       |FROM t ORDER BY l""".stripMargin

  // --------------------------------------------------- t_closeness_audit

  /** t-closeness audit on the same classes and sensitive bands:
    * even an l-diverse class leaks when its band DISTRIBUTION sits
    * far from the population's — t = total variation distance
    * between the class and global band distributions, per class.
    * With cb_b the class counts and g_b the global counts, t =
    * Sum_b |cb_b*N - g_b*k| / (2*k*N): the numerator sums exact
    * (19,0)xint decimal products, the threshold counts (t > 0.2,
    * 1/3, 0.5) compare INTEGER cross-products (5S > 2kN etc. -
    * never a double at a rational boundary), and only max_t's final
    * division runs in (identically-cast) double space. Exact while
    * k*N < 10^18 - i.e. any corpus this side of 10^9 customers.
    *
    * Scale shape: one customer pass to the class x band pivot (4
    * conditional counts per class), a broadcast 1-row global, then
    * a <=125-row fold.
    */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val banded = Tables(spark, dir).customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("ab"))
      .withColumn("band", expr(SensBandCase))
    val per = banded.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("band") === 0, 1L).otherwise(0L)).as("cb0"),
        sum(when(col("band") === 1, 1L).otherwise(0L)).as("cb1"),
        sum(when(col("band") === 2, 1L).otherwise(0L)).as("cb2"),
        sum(when(col("band") === 3, 1L).otherwise(0L)).as("cb3"))
    val glob = banded.agg(count(lit(1)).as("nn"),
      sum(when(col("band") === 0, 1L).otherwise(0L)).as("g0"),
      sum(when(col("band") === 1, 1L).otherwise(0L)).as("g1"),
      sum(when(col("band") === 2, 1L).otherwise(0L)).as("g2"),
      sum(when(col("band") === 3, 1L).otherwise(0L)).as("g3"))
    per.crossJoin(broadcast(glob))
      .withColumn("s", expr(TcNumerator))
      .agg(count(lit(1)).as("n_classes"),
        max(expr(TcT)).as("max_t"),
        sum(expr(s"CASE WHEN $Tc020 THEN 1 ELSE 0 END")).as("n_above_020"),
        sum(expr(s"CASE WHEN $Tc033 THEN 1 ELSE 0 END")).as("n_above_033"),
        sum(expr(s"CASE WHEN $Tc050 THEN 1 ELSE 0 END")).as("n_above_050"))
      .selectExpr("CAST(n_classes AS BIGINT) AS n_classes",
        "CAST(max_t AS DOUBLE) AS max_t",
        "CAST(n_above_020 AS BIGINT) AS n_above_020",
        "CAST(n_above_033 AS BIGINT) AS n_above_033",
        "CAST(n_above_050 AS BIGINT) AS n_above_050")
  }

  // S = Sum_b |cb_b*N - g_b*k| as exact decimals; thresholds as pure
  // integer cross-multiplications against 2kN
  private val TcNumerator: String =
    Seq(0, 1, 2, 3).map(b =>
      s"abs(CAST(cb$b AS DECIMAL(19,0)) * nn - CAST(g$b AS DECIMAL(19,0)) * k)")
      .mkString("(", " + ", ")")
  private val TcKn = "(CAST(2 * k AS DECIMAL(19,0)) * nn)"
  private val TcT =
    s"(CAST(s AS DOUBLE) / (CAST(2 AS DOUBLE) * CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)))"
  private val Tc020 = s"CAST(s AS DECIMAL(19,0)) * 5 > $TcKn"
  private val Tc033 = s"CAST(s AS DECIMAL(19,0)) * 3 > $TcKn"
  private val Tc050 = s"CAST(s AS DECIMAL(19,0)) * 2 > $TcKn"

  val tClosenessAuditSql: String =
    s"""WITH cust AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS ab
       |  FROM customer),
       |b AS (SELECT c_nationkey, c_mktsegment, $SensBandCase AS band FROM cust),
       |per AS (
       |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb0,
       |    CAST(sum(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb1,
       |    CAST(sum(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cb2,
       |    CAST(sum(CASE WHEN band = 3 THEN 1 ELSE 0 END) AS BIGINT) AS cb3
       |  FROM b GROUP BY 1, 2),
       |gpop AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
       |    CAST(sum(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
       |    CAST(sum(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
       |    CAST(sum(CASE WHEN band = 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3
       |  FROM b),
       |sc AS (SELECT per.*, nn, $TcNumerator AS s FROM per, gpop)
       |SELECT CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(max($TcT) AS DOUBLE) AS max_t,
       |  CAST(sum(CASE WHEN $Tc020 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_020,
       |  CAST(sum(CASE WHEN $Tc033 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_033,
       |  CAST(sum(CASE WHEN $Tc050 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_050
       |FROM sc""".stripMargin
}
