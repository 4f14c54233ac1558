package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** Shipping-priority top-N (TPC-H Q3 shape): two shuffle joins on
    * the order key + one grouped agg; the final top-10 is a TakeOrdered
    * (no global sort materialization). Decimal revenue for exactness;
    * order-key tiebreak for determinism.
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      col("o_orderpriority"))
    val li = t.lineitem.select(col("l_orderkey"),
      (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("l_orderkey").as("order_key"),
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        col("o_orderpriority").as("order_priority"), col("revenue"))
      .orderBy(col("revenue").desc, col("order_key"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey AS order_key,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
      |  o_orderpriority AS order_priority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, order_key
      |LIMIT 10""".stripMargin

  /** Local-supplier volume rollup (TPC-H Q5 shape): 6-table join tree
    * with every dimension side broadcast; only customer⋈orders⋈lineitem
    * shuffle on their keys.
    */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val region = t.region.filter(col("r_name") === "ASIA")
    val nat = t.nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
    val c = t.customer.select(col("c_custkey"), col("c_nationkey"))
    val o = t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"),
      (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("n_name").as("nation"), col("revenue"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  val q5Sql: String =
    """SELECT n_name AS nation,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, nation""".stripMargin

  /** Per-customer running order total — cumulative window frame
    * (rows unbounded-preceding..current), decimal-exact accumulation.
    */
  def windowRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    // ISO date strings sort identically to the underlying dates
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("order_date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        money(col("o_totalprice")).as("p"))
      .withColumn("running_total", sum(col("p")).over(w).cast("double"))
      .select(col("o_custkey").as("cust_key"), col("o_orderkey").as("order_key"),
        col("order_date"), col("running_total"))
      .orderBy("cust_key", "order_key")
  }

  val windowRunningTotalSql: String =
    """SELECT o_custkey AS cust_key, o_orderkey AS order_key,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY cust_key, order_key""".stripMargin

  /** Sliding 3-row moving average of order totals per customer —
    * bounded window frame (vs the running total's unbounded frame).
    */
  def windowMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("order_date"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        money(col("o_totalprice")).as("p"))
      .withColumn("moving_avg",
        sum(col("p")).over(w).cast("double") / count(col("p")).over(w).cast("double"))
      .select(col("o_custkey").as("cust_key"), col("o_orderkey").as("order_key"),
        col("order_date"), col("moving_avg"))
      .orderBy("cust_key", "order_key")
  }

  val windowMovingAvgSql: String =
    """SELECT o_custkey AS cust_key, o_orderkey AS order_key,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         OVER (PARTITION BY o_custkey ORDER BY CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderkey
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  / CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderkey
      |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg
      |FROM orders ORDER BY cust_key, order_key""".stripMargin

  /** Quartile bucketing of order values within each priority class —
    * ntile over a total order (deterministic bucket boundaries).
    *
    * Scale shape: `o_orderpriority` has FIVE distinct values, so a
    * window partitioned on it alone drags N/5 of the order table
    * through one task's sort at scale. Instead the rank comes from
    * [[Commerce.classRowNumber]] — rows rank locally within
    * (priority, totalprice-band) partitions and per-band counts take
    * the tiny ordered window — and ntile is then pure arithmetic on
    * (rank, class count). The oracle states the plain ntile window;
    * equal by construction.
    */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val n = o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("__n"))
    Commerce.classRowNumber(o, Seq("o_orderpriority"),
        floor(col("o_totalprice") / PriceBandWidth).cast("long"),
        Seq(col("o_totalprice"), col("o_orderkey")), "__rk")
      .join(broadcast(n), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        Commerce.ntileExpr("__rk", "__n", 4).cast("int").as("quartile"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Bucket width for the within-priority totalprice rank bands used
    * by [[ntileBuckets]] and [[windowPercentRank]]: orders whose total
    * falls in the same `width`-sized band rank locally together.
    * TPC-H totals span ~850..560k, so 1000 gives a few hundred bands
    * per class — thousands of even local sorts instead of five huge
    * ones.
    */
  private[graft] val PriceBandWidth = 1000.0

  val ntileBucketsSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
      |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Top-3 orders per customer — rank-per-group, the reference's
    * QUALIFY row_number pattern generalized to k>1.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= 3)
      .select(col("o_custkey").as("cust_key"), col("o_orderkey").as("order_key"),
        col("o_totalprice").as("total_price"), col("rank_in_group"))
      .orderBy("cust_key", "rank_in_group")
  }

  val topkPerGroupSql: String =
    """SELECT cust_key, order_key, total_price,
      |  CAST(rank_in_group AS INTEGER) AS rank_in_group
      |FROM (
      |  SELECT o_custkey AS cust_key, o_orderkey AS order_key,
      |    o_totalprice AS total_price,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_group
      |  FROM orders
      |  QUALIFY rank_in_group <= 3)
      |ORDER BY cust_key, rank_in_group""".stripMargin

  /** Top-3 per group again — but via the custom bounded-heap
    * aggregate instead of a window: partial aggregation ships ≤k pairs
    * per group per map task (O(groups·k) shuffle vs the window's
    * O(rows) shuffle + sort). Oracle: the SAME window SQL as
    * `topk_per_group` — two implementations, one result.
    */
  def topkPerGroupAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg(call_function("graft_topk", lit(3),
        struct(col("o_totalprice"), col("o_orderkey"))).as("top"))
      .select(col("o_custkey").as("cust_key"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("cust_key"),
        col("entry.id").as("order_key"),
        col("entry.ord").as("total_price"),
        (col("pos") + 1).cast("int").as("rank_in_group"))
      .orderBy("cust_key", "rank_in_group")
  }

  val topkPerGroupAggSql: String = topkPerGroupSql

  /** Gap-based sessionization of the event stream (30-min inactivity
    * boundary): lag → new-session flag → cumulative session seq → one
    * row per session. Batch analog of the streaming
    * flatMapGroupsWithState path; all in epoch-micros long arithmetic.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"), money(col("value")).as("v"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("value_sum"))
      .orderBy("user_id", "session_seq")
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(value AS DECIMAL(18,2)) AS v,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |s AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM f)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  min(ts_us) AS session_start_us,
      |  max(ts_us) AS session_end_us, count(*) AS n_events,
      |  CAST(sum(v) AS DOUBLE) AS value_sum
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Idle-gap ladder for the sessionization tuning curve, minutes —
    * doubling around the production 30-minute cut.
    */
  private val SessionGapLadderMin: Seq[Long] = Seq(5L, 15L, 30L, 60L)

  /** Session-count / dwell-time sensitivity to the idle-gap
    * threshold: for each ladder gap, how many sessions the event log
    * splits into, events per session, and the mean in-session dwell —
    * the tuning curve behind [[sessionize]]'s fixed 30-minute cut
    * (the `ann_probe_width_curve` pattern applied to the behavioral
    * layer: before shipping a threshold, ship the curve that
    * justifies it). One window pass computes every inter-event gap;
    * all four ladder points are conditional sums over it — no
    * per-threshold re-sessionization, no extra shuffle. Exact
    * integer microsecond sums; two guarded divides per row.
    */
  def sessionGapSensitivity(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gaps = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wOrd))
      .select(when(col("prev_us").isNull, lit(null))
        .otherwise(col("ts_us") - col("prev_us")).as("gap_us"))
    val perGap = SessionGapLadderMin.flatMap { gm =>
      val gu = gm * 60L * 1000000L
      Seq(
        // a session STARTS at every first event and at every gap
        // above the threshold
        sum(when(col("gap_us").isNull || col("gap_us") > gu, 1L).otherwise(0L))
          .as(s"ns_$gm"),
        sum(when(col("gap_us").isNotNull && col("gap_us") <= gu, col("gap_us"))
          .otherwise(lit(0L))).as(s"dwell_$gm"))
    }
    val aggCols = Seq(count(lit(1)).as("n_events")) ++ perGap
    val m = gaps.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = SessionGapLadderMin.map(gm =>
      s"CAST($gm AS BIGINT), n_events, ns_$gm, dwell_$gm").mkString(", ")
    m.selectExpr(s"stack(${SessionGapLadderMin.size}, $stackArgs)" +
        " AS (gap_minutes, n_events, n_sessions, dwell_us)")
      .selectExpr("gap_minutes", "CAST(n_events AS BIGINT) AS n_events",
        "CAST(n_sessions AS BIGINT) AS n_sessions",
        "CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS events_per_session",
        """CASE WHEN n_sessions = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(dwell_us AS DOUBLE) / CAST(n_sessions AS DOUBLE) / CAST(1000000 AS DOUBLE)
          |END AS mean_session_dwell_s""".stripMargin)
      .orderBy("gap_minutes")
  }

  lazy val sessionGapSensitivitySql: String = {
    val perGap = SessionGapLadderMin.flatMap { gm =>
      val gu = gm * 60L * 1000000L
      Seq(
        s"CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > $gu THEN 1 ELSE 0 END) AS BIGINT) AS ns_$gm",
        s"CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= $gu THEN gap_us ELSE 0 END) AS BIGINT) AS dwell_$gm")
    }.mkString(",\n    ")
    val unions = SessionGapLadderMin.map(gm =>
      s"""SELECT CAST($gm AS BIGINT) AS gap_minutes,
         |  CAST(n_events AS BIGINT) AS n_events,
         |  CAST(ns_$gm AS BIGINT) AS n_sessions,
         |  CAST(n_events AS DOUBLE) / CAST(ns_$gm AS DOUBLE) AS events_per_session,
         |  CASE WHEN ns_$gm = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(dwell_$gm AS DOUBLE) / CAST(ns_$gm AS DOUBLE) / CAST(1000000 AS DOUBLE)
         |  END AS mean_session_dwell_s
         |FROM m""".stripMargin).mkString("\nUNION ALL ")
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
       |  FROM events),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_events,
       |    $perGap
       |  FROM e)
       |$unions
       |ORDER BY gap_minutes""".stripMargin
  }

  private val OverlapCellUs = 3600L * 1000000 // 1-hour join cells

  /** Concurrent-session pairs per day — an INTERVAL-OVERLAP self-join
    * (two interval sets, `a.start ≤ b.end AND b.start ≤ a.end`), the
    * join family the engine hadn't covered (band join = point-in-
    * interval; as-of = nearest-preceding-point). Counts, per day, the
    * session pairs that were open simultaneously (the concurrency/load
    * profile of the event stream).
    *
    * Scale shape: an inequality self-join would be a cartesian
    * product, so both sides are bucketed into fixed-width TIME CELLS
    * (1 h): each session fans out map-side to the cells it spans
    * (gap-bounded sessions span ~1 cell), the join is an EQUI-join on
    * the cell key, and the overlap predicate is a residual filter —
    * work is Σ per-cell n², i.e. proportional to true temporal
    * concurrency, never corpus². A pair spanning several shared cells
    * would match in each; it is counted exactly ONCE by keeping only
    * the match in the cell containing the overlap's anchor
    * (`greatest(start_a, start_b)` — a point inside both intervals,
    * so the anchor cell is guaranteed to be probed by both sides:
    * lossless dedup without a distinct). Same-user pairs are excluded
    * by the (user, seq) ordering; a user's own sessions are disjoint
    * by the gap construction anyway.
    */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionize(spark, dir)
      .select(col("user_id"), col("session_seq"),
        col("session_start_us").as("a"), col("session_end_us").as("b"))
    val cells = s.withColumn("cell",
      explode(sequence(expr(s"a div $OverlapCellUs"), expr(s"b div $OverlapCellUs"))))
    val l = cells.select(col("cell"), col("user_id").as("ua"),
      col("session_seq").as("sa"), col("a").as("a1"), col("b").as("b1"))
    val r = cells.select(col("cell"), col("user_id").as("ub"),
      col("session_seq").as("sb"), col("a").as("a2"), col("b").as("b2"))
    l.join(r, Seq("cell"))
      .filter(col("ua") < col("ub") ||
        (col("ua") === col("ub") && col("sa") < col("sb")))
      .filter(col("a1") <= col("b2") && col("a2") <= col("b1"))
      .filter(expr(s"greatest(a1, a2) div $OverlapCellUs") === col("cell"))
      .select(timestamp_micros(greatest(col("a1"), col("a2")))
        .cast("date").cast("string").as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("day")
  }

  val sessionOverlapSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |g AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM f),
      |s AS (
      |  SELECT user_id, session_seq, min(ts_us) AS a, max(ts_us) AS b
      |  FROM g GROUP BY user_id, session_seq),
      |p AS (
      |  SELECT greatest(x.a, y.a) AS anchor
      |  FROM s x JOIN s y
      |    ON (x.user_id < y.user_id OR (x.user_id = y.user_id AND x.session_seq < y.session_seq))
      |   AND x.a <= y.b AND y.a <= x.b)
      |SELECT CAST(CAST(make_timestamp(anchor) AS DATE) AS VARCHAR) AS day,
      |       count(*) AS n_pairs
      |FROM p GROUP BY day ORDER BY day""".stripMargin

  /** Top event paths (sequential-pattern mining, order-3): the ten
    * most common consecutive event-type triples across all user
    * streams — the "what do users actually do" table behind funnel
    * design (funnel_conversion checks ONE hypothesized path; this
    * surfaces the real ones).
    *
    * Scale shape: one user-partitioned window sort serves both lead()
    * offsets (same spec ⇒ Spark plans a single Window operator), the
    * triple counts partial-aggregate map-side (≤ |event_types|³
    * distinct paths per task), and the top-10 is a TakeOrdered — no
    * global sort, no self-joins (the naive 3-way event self-join on
    * user_id would square the hot users).
    */
  def pathTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(10)
  }

  val pathTopkSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e3
      |  FROM events)
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n_occurrences
      |FROM e WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 10""".stripMargin

  /** Row-pattern matching (MATCH_RECOGNIZE-lite): each user-day's
    * events collapse to an ORDERED initial string ("vvcp…"), and
    * journey patterns are plain regexes over it — ordered-funnel,
    * entry-point, and burst shapes in one operator instead of one
    * bespoke staged join per question (`funnel_conversion` checks one
    * hypothesized path; this greps for any). Patterns stay in the
    * common Java-regex ∩ RE2 dialect (literals, classes, `.*`,
    * bounded repeats — no lookaround), so the DuckDB oracle runs them
    * verbatim.
    *
    * Scale shape: the journey string is bounded by a user's events in
    * ONE day (the sessionize-style grain cap — never a whole-history
    * collect); sort-then-join makes it deterministic; the three
    * literal rlikes evaluate map-side over the aggregated frame and
    * unpivot into (pattern, matches) via a bounded map explode.
    */
  def eventRegexMatch(spark: SparkSession, dir: String): DataFrame = {
    val journeys = Tables(spark, dir).events
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).cast("date").as("d"),
        struct(col("ts_us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini")).as("e"))
      .groupBy(col("user_id"), col("d"))
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        e => e.getField("ini")), "").as("journey"))
    val pats = Seq(
      "funnel_view_click_purchase" -> "v.*c.*p",
      "signup_first" -> "^s",
      "error_burst" -> "ee")
    journeys
      .select(explode(map(pats.flatMap { case (n, p) =>
        Seq(lit(n), col("journey").rlike(p).cast("long"))
      }: _*)).as(Seq("pattern", "m")))
      .groupBy(col("pattern"))
      .agg(sum(col("m")).as("n_user_days"))
      .orderBy("pattern")
  }

  val eventRegexMatchSql: String =
    """WITH j AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS journey
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT p.pattern,
      |  CAST(sum(CASE WHEN regexp_matches(j.journey, p.rx) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_user_days
      |FROM j, (VALUES ('funnel_view_click_purchase', 'v.*c.*p'),
      |                ('signup_first', '^s'),
      |                ('error_burst', 'ee')) AS p(pattern, rx)
      |GROUP BY p.pattern ORDER BY p.pattern""".stripMargin

  /** Deterministic stratified sampling: per-stratum rates applied via a
    * content-hash bucket (md5 of the row key, mod 100) instead of RNG —
    * membership is a pure function of the key, so the sample is stable
    * under repartitioning, re-runs, and incremental rebuilds (the
    * property `TABLESAMPLE`/`rand()` sampling lacks), and it needs no
    * shuffle at all: pure map-side filter at any scale.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100)
    val rate = when(col("o_orderpriority").startsWith("1"), 20)
      .when(col("o_orderpriority").startsWith("2"), 15)
      .otherwise(10)
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderpriority"), bucket.as("bucket"),
        rate.as("stratum_pct"))
      .filter(col("bucket") < col("stratum_pct"))
      .orderBy("o_orderkey")
  }

  val stratifiedSampleSql: String =
    """WITH b AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
      |    CAST(CASE WHEN o_orderpriority LIKE '1%' THEN 20
      |              WHEN o_orderpriority LIKE '2%' THEN 15
      |              ELSE 10 END AS INTEGER) AS stratum_pct
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, bucket, stratum_pct
      |FROM b WHERE bucket < stratum_pct ORDER BY o_orderkey""".stripMargin

  /** Large-volume-customer report (TPC-H Q18 shape): HAVING-filtered
    * aggregate subquery (orders whose total quantity exceeds a
    * threshold) re-joined to its dimensions. The HAVING pre-aggregate
    * runs FIRST and keeps only qualifying order keys — the fact
    * re-scan then semi-joins against that (small) key set instead of
    * aggregating everything twice. Decimal quantity math.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.lineitem.select(col("l_orderkey"), money(col("l_quantity")).as("qty"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qty")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
      .select(col("l_orderkey").as("big_key"))
    t.orders.join(big, col("o_orderkey") === col("big_key"))
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), money(col("l_quantity")).as("qty")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_name"), col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("order_date"))
      .agg(sum(col("qty")).cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
      |SELECT c.c_name, o.o_custkey, o.o_orderkey,
      |  CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM orders o
      |JOIN big ON big.l_orderkey = o.o_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2, 3, 4
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Item co-occurrence recommender ("bought together"): per-order
    * basket sets → all ordered in-basket pairs → pair counts → top-3
    * partners per part. ONE basket aggregation (`collect_set` dedupes
    * and groups in the same shuffle) replaces the
    * distinct-then-self-join formulation's two extra exchanges (the
    * distinct shuffle plus the orderkey join shuffle): pairs explode
    * MAP-SIDE from each basket array, so pair volume is still
    * Σ basket² per order (baskets are small and bounded — a
    * collect_set buffer holds one order's parts), never corpus².
    * The pair aggregation partial-aggregates map-side, and the
    * per-part top-3 runs through the BoundedTopK aggregate (map-side
    * k-heaps, O(parts·k) shuffle) instead of a full window sort of
    * the pair table. The batch core of a co-purchase recommendation
    * feed.
    */
  def cooccurRecs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    // the session-shared Σ basket² pair counts (optimization round 18)
    val pairs = graft.operators.Graph.basketPairCounts(spark, dir)
      .select(col("p1"), col("p2"), col("c").as("n_cooccur"))
    pairs.groupBy(col("p1"))
      .agg(call_function("graft_topk", lit(3),
        struct(col("n_cooccur").cast("double"), col("p2"))).as("top"))
      .select(col("p1").as("part_key"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("part_key"), col("entry.id").as("rec_part_key"),
        col("entry.ord").cast("int").as("n_cooccur"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("part_key", "rank")
  }

  /** Item-item collaborative filtering: top-3 similar parts by COSINE
    * of purchase vectors — `cooccur_recs` normalized (raw co-counts
    * favor popular items; cosine c_ij/√(n_i·n_j) surfaces genuinely
    * correlated ones, a different ranking). Same Σ basket² pair bound
    * and BoundedTopK tail as cooccur; the per-part basket counts ride
    * two tiny broadcasts (part-dictionary-sized). The score is one
    * sqrt of an exact-integer product and one division — correctly
    * rounded with fixed operand order, so the ranking AND the score
    * column hash-match the oracle.
    */
  def itemitemCf(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    val items = Tables(spark, dir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val cnt = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    // the session-shared Σ basket² pair counts (optimization round 18)
    val pairs = graft.operators.Graph.basketPairCounts(spark, dir)
      .select(col("p1"), col("p2"), col("c").as("n_cooccur"))
      .join(broadcast(cnt.select(col("l_partkey").as("p1"), col("c").as("__ca"))), Seq("p1"))
      .join(broadcast(cnt.select(col("l_partkey").as("p2"), col("c").as("__cb"))), Seq("p2"))
      .withColumn("score",
        col("n_cooccur").cast("double") / sqrt((col("__ca") * col("__cb")).cast("double")))
    pairs.groupBy(col("p1"))
      .agg(call_function("graft_topk", lit(3), struct(col("score"), col("p2"))).as("top"))
      .select(col("p1").as("part_key"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("part_key"), col("entry.id").as("rec_part_key"),
        col("entry.ord").as("score"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy("part_key", "rank")
  }

  val itemitemCfSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_cooccur
      |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT p1, p2,
      |    CAST(n_cooccur AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS score
      |  FROM pairs JOIN cnt ca ON ca.l_partkey = p1 JOIN cnt cb ON cb.l_partkey = p2),
      |r AS (SELECT p1, p2, score,
      |        row_number() OVER (PARTITION BY p1 ORDER BY score DESC, p2) AS rk
      |      FROM scored)
      |SELECT p1 AS part_key, p2 AS rec_part_key, score, CAST(rk AS INTEGER) AS rank
      |FROM r WHERE rk <= 3 ORDER BY part_key, rank""".stripMargin

  val cooccurRecsSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_cooccur
      |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
      |  GROUP BY 1, 2),
      |r AS (SELECT p1, p2, n_cooccur,
      |        row_number() OVER (PARTITION BY p1 ORDER BY n_cooccur DESC, p2) AS rk
      |      FROM pairs)
      |SELECT p1 AS part_key, p2 AS rec_part_key, CAST(n_cooccur AS INTEGER) AS n_cooccur,
      |  CAST(rk AS INTEGER) AS rank
      |FROM r WHERE rk <= 3 ORDER BY part_key, rank""".stripMargin

  // ------------------------------------------------------ recs_coverage_profile

  /** Catalog coverage and concentration of the co-occurrence
    * recommender — the diversity half of the recsys eval pair
    * (`recs_holdout_eval` scores ACCURACY; a recommender can be
    * accurate while recommending the same 50 bestsellers to
    * everyone, and this one-row profile is what catches it):
    * coverage = share of catalog that appears as a recommendation,
    * concentration = Gini–Simpson 1 − Σp² of recommendation
    * appearances (log-free, the `user_event_diversity` convention),
    * plus the single most-recommended part's share. Appearance
    * counts are exact; Σc² and (Σc)² factors cast to double
    * individually (sub-2⁵³ ledger — Σc = 3·catalog holds to ~10¹⁵
    * rec rows).
    *
    * Scale shape: rides `cooccur_recs`' Σ basket² pair build (plan-
    * matched, so a warm cache shares it); the appearance aggregate
    * is catalog-bounded; the part-count side is a dim aggregate.
    */
  def recsCoverageProfile(spark: SparkSession, dir: String): DataFrame = {
    val recs = cooccurRecs(spark, dir)
    val app = recs.groupBy(col("rec_part_key")).agg(count(lit(1)).as("c"))
    val stats = app.agg(
      count(lit(1)).as("n_recommended"),
      sum(col("c")).as("tot"),
      sum(expr("c * c")).as("sumsq"),
      max(col("c")).as("mx"))
    val cat = Tables(spark, dir).part.agg(count(lit(1)).as("n_catalog"))
    stats.crossJoin(broadcast(cat))
      .selectExpr("CAST(n_catalog AS BIGINT) AS n_catalog",
        "CAST(n_recommended AS BIGINT) AS n_recommended",
        "CAST(n_recommended AS DOUBLE) / CAST(n_catalog AS DOUBLE) AS coverage",
        """CAST(1 AS DOUBLE) - CAST(sumsq AS DOUBLE)
          | / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS rec_concentration""".stripMargin,
        "CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) AS top_rec_share")
  }

  val recsCoverageProfileSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_cooccur
      |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
      |  GROUP BY 1, 2),
      |r AS (SELECT p1, p2,
      |        row_number() OVER (PARTITION BY p1 ORDER BY n_cooccur DESC, p2) AS rk
      |      FROM pairs),
      |recs AS (SELECT p1, p2 FROM r WHERE rk <= 3),
      |app AS (SELECT p2, CAST(count(*) AS BIGINT) AS c FROM recs GROUP BY 1),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_recommended,
      |    CAST(sum(c) AS BIGINT) AS tot,
      |    CAST(sum(c * c) AS BIGINT) AS sumsq,
      |    CAST(max(c) AS BIGINT) AS mx
      |  FROM app),
      |cat AS (SELECT CAST(count(*) AS BIGINT) AS n_catalog FROM part)
      |SELECT n_catalog, n_recommended,
      |  CAST(n_recommended AS DOUBLE) / CAST(n_catalog AS DOUBLE) AS coverage,
      |  CAST(1 AS DOUBLE) - CAST(sumsq AS DOUBLE)
      |   / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS rec_concentration,
      |  CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) AS top_rec_share
      |FROM s, cat""".stripMargin

  /** Relative-standing windows: percent_rank + cume_dist per priority
    * class over a total order (totalprice, key tiebreak). Both
    * functions are integer-ratio divisions ((rank−1)/(n−1),
    * rows≤current/n), so the doubles are bit-identical across engines.
    *
    * Scale shape: same 5-value-partition cliff as [[ntileBuckets]] —
    * the rank comes from the distributed
    * [[Commerce.classRowNumber]] prefix sum, and because the ORDER BY
    * carries the unique order key (total order, no ties) rank() =
    * row_number() and the cume_dist peer group is a single row, so
    * both functions collapse to exact arithmetic on (rank, class
    * count). The oracle states the plain window functions; equal by
    * construction.
    */
  def windowPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val n = o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("__n"))
    Commerce.classRowNumber(o, Seq("o_orderpriority"),
        floor(col("o_totalprice") / PriceBandWidth).cast("long"),
        Seq(col("o_totalprice"), col("o_orderkey")), "__rk")
      .join(broadcast(n), Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("__n") === 1, lit(0.0)).otherwise(
          (col("__rk") - 1).cast("double") / (col("__n") - 1).cast("double"))
          .as("pct_rank"),
        (col("__rk").cast("double") / col("__n").cast("double")).as("cume"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  val windowPercentRankSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Order-priority checking (TPC-H Q4 shape): EXISTS subquery as a
    * LEFT SEMI join with a non-equi residual (late-shipment predicate)
    * — one shuffle on the order key, lineitem never widens the output,
    * and the semi short-circuits per order on first match. The
    * received/committed-date pair is re-expressed on this schema as
    * "shipped more than 60 days after order date".
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Forecast-revenue-change filter-aggregate (TPC-H Q6 shape): single
    * pruned scan, every predicate pushed to the parquet reader, one
    * partial+final aggregation — the plan is map-side everything with a
    * 1-row exchange. Decimal money math for cross-engine exactness.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) * money(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      |  AND l_quantity < 24""".stripMargin

  /** Per-user event-adjacency projection (lead/lag over the event
    * stream): one shuffle+sort on (user_id, ts) serves all three window
    * functions — the step-to-step funnel/latency primitive. Micros-long
    * timestamp arithmetic (see Tables.events).
    */
  def windowLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("us_since_prev", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("prev_type"), col("next_type"), col("us_since_prev"))
  }

  val windowLeadLagSql: String =
    """SELECT event_id, user_id, event_type,
      |  lag(event_type) OVER w AS prev_type,
      |  lead(event_type) OVER w AS next_type,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY user_id, epoch_us(ts), event_id""".stripMargin

  /** Ordered multi-step funnel (view → click ≤7d later → purchase ≤7d
    * after that): each stage is a conditional-min aggregation per user
    * followed by a join back to the event stream — stage predicates are
    * time-ordered ("strictly after the previous stage, within the
    * window"), which a bare conditional-count funnel gets wrong. Output
    * is one summary row with int-exact counts and int/int-division
    * conversion rates (bit-identical across engines).
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val SevenDaysUs = 7L * 24 * 3600 * 1000000L
    // ONE shuffle: per-user stage timestamps land in three conditional
    // collect_lists (a user's event history is small and bounded), and
    // the dependent stage mins (t2 > t1, t3 > t2, each within 7 days)
    // are per-row array math — no stage joins, no re-scans. The
    // singleton final agg then reduces users map-side. Cardinality
    // caveat: the arrays hold one entry per click/purchase PER USER —
    // bounded by per-user activity, not corpus size. For a pathological
    // key whose history can't sit in one task, fall back to the staged
    // join formulation (git history, round-3) at O(rows) shuffle.
    val stage = Tables(spark, dir).events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("t1"),
        collect_list(when(col("event_type") === "click", col("ts_us"))).as("cts"),
        collect_list(when(col("event_type") === "purchase", col("ts_us"))).as("pts"))
      .withColumn("t2", array_min(filter(col("cts"),
        x => x > col("t1") && x <= col("t1") + SevenDaysUs)))
      .withColumn("t3", array_min(filter(col("pts"),
        x => x > col("t2") && x <= col("t2") + SevenDaysUs)))
    stage.agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after_view"),
        count(col("t3")).as("n_purchase_after_click"))
      .withColumn("view_to_click",
        col("n_click_after_view").cast("double") / col("n_view"))
      .withColumn("click_to_purchase",
        col("n_purchase_after_click").cast("double") / col("n_click_after_view"))
  }

  val funnelConversionSql: String =
    """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 AND epoch_us(e.ts) <= v.t1 + 604800000000 GROUP BY 1),
      |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 AND epoch_us(e.ts) <= c.t2 + 604800000000 GROUP BY 1)
      |SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
      |  (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_click_after_view,
      |  (SELECT count(*) FROM p) AS n_purchase_after_click,
      |  CAST((SELECT count(*) FROM c) AS DOUBLE) / (SELECT count(*) FROM v) AS view_to_click,
      |  CAST((SELECT count(*) FROM p) AS DOUBLE) / (SELECT count(*) FROM c) AS click_to_purchase""".stripMargin

  /** Bilateral trade volume (TPC-H Q7 shape): revenue between two
    * nations by ship year, both directions. Nation (a constant-25
    * lookup) is the only static broadcast; the supplier and customer
    * joins stay UNhinted — their nation-filtered sides are
    * O(|suppliers|)/O(|customers|), so AQE decides at runtime (the
    * fact_sales BroadcastDimRowCap lesson). The two fact-sized streams
    * meet on one orderkey shuffle each.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = broadcast(t.nation
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name")))
    val sup = t.supplier.join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t.customer.join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val lsup = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("volume"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
    val ocust = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    lsup.join(ocust, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("volume")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
      |    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier s
      |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Returned-item revenue report (TPC-H Q10 shape): which customers
    * returned the most, one quarter. The date filter prunes orders at
    * the scan, the returnflag filter prunes lineitem; two shuffle
    * joins (orderkey, custkey) + broadcast nation; the final top-20 is
    * a TakeOrdered, never a global sort. Deterministic via the custkey
    * tiebreak on the exact-decimal revenue.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("volume"))
    val c = t.customer.join(broadcast(Tables(spark, dir).nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("volume")).cast("double").as("revenue"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  c.c_acctbal, n.n_name
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Promotion revenue share (TPC-H Q14 shape): one month of
    * lineitem against the part catalog, conditional-sum ratio. The
    * ship-date filter reaches the parquet scan; the part join is
    * UNhinted (the catalog is dimension-sized but unbounded — AQE
    * promotes when it fits). The percentage divides the two
    * exact-decimal sums already in the output — bit-identical.
    */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("l_partkey"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("volume"))
    l.join(t.part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("volume"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("promo_revenue"),
        sum(col("volume")).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  val q14Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      |  100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |    THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin

  /** Discounted-revenue with a disjunctive predicate (TPC-H Q19
    * shape): an OR-of-ANDs spanning both join sides. The classic Q19
    * rewrite applies: each table's implied envelope (the union of its
    * per-branch ranges) is conjoined BEFORE the join so it pushes to
    * the parquet scans — lineitem reads only qty ∈ [1,30], part only
    * the three brands with size ≤ 15 — and the exact OR evaluates as
    * the post-join residual on the survivors.
    */
  def q19DiscountRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l = t.lineitem
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("volume"))
    val p = t.part
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size") >= 1 && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size") <= 5 &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size") <= 10 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#34" && col("p_size") <= 15 &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30))
      .agg(sum(col("volume")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q19Sql: String =
    """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------- weighted_median

  /** Quantity-weighted median unit price per return flag: the price v
    * at which half the shipped QUANTITY (not half the line count —
    * that is `quantile_profile`'s median) sits at or below v. Lower
    * weighted median, no interpolation: values are pre-grouped by
    * exact price so ties carry summed weight, the cumulative weight
    * runs over the price order, and the answer is the min price with
    * 2·cum ≥ total — every comparison exact integer (quantity scaled
    * ×100 via decimal, never a truncating cast; the abc_classification
    * lesson). Engine-identical by construction.
    *
    * Scale shape: group-by (flag, price) partial-aggregates the fact
    * scan down to the distinct-price grain; the cumulative window
    * then runs per flag over that REDUCED frame (≤ distinct prices,
    * not lines). The 2·cum ≥ total scan is a bounded-cardinality
    * filter; no full-data window ever runs.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val grouped = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(expr("sum(CAST(l_quantity * 100 AS BIGINT))").as("w"))
    val cum = grouped
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy("l_returnflag").orderBy("price")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("w")).over(Window.partitionBy("l_returnflag")))
    cum.filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(expr("CAST(min(price) AS DOUBLE)").as("wmedian_price"),
        max(col("total")).as("total_weight_x100"))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------- twap_value

  /** Time-weighted average value per event type (the TWAP/telemetry
    * convention: a reading holds until the next one, so each value
    * weighs by its holding interval, not by observation count — burst
    * sampling doesn't distort the average the way `welch_t_test`'s
    * plain mean would be distorted). Weights are exact µs gaps to the
    * next same-type event (the last observation has no interval and
    * drops, mirrored); value·Δt products accumulate in decimal(38,0)
    * and ONE division closes — int64/int128-to-double single-rounding
    * territory on both engines.
    *
    * Scale shape: one type-partitioned lead() window orders by time
    * within each type (the sessionize shuffle key), then a ≤|types|
    * rollup. At 100 TB the window partitions by (type, day) with
    * day-boundary intervals clipped — same plan, bounded partitions.
    */
  def twapValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
    Tables(spark, dir).events
      .select(col("event_type"), col("ts_us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dt").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(expr("CAST(v_c AS DECIMAL(38,0)) * dt")).as("num"),
        sum(col("dt")).as("den"))
      .select(col("event_type"), col("n_intervals"),
        expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / CAST(100 AS DOUBLE)").as("twap"))
      .orderBy("event_type")
  }

  val twapValueSql: String =
    """WITH o AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS v_c
      |  FROM events),
      |d AS (
      |  SELECT *, lead(ts_us) OVER (PARTITION BY event_type
      |    ORDER BY ts_us, event_id) - ts_us AS dt
      |  FROM o)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(CAST(v_c AS DECIMAL(38,0)) * dt) AS DOUBLE)
      |    / CAST(sum(dt) AS DOUBLE) / CAST(100 AS DOUBLE) AS twap
      |FROM d WHERE dt IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- activity_heatmap

  /** Day-of-week × hour activity heatmap over the event stream (the
    * seasonal_index epoch-day convention lifted to two dimensions):
    * pure integer µs arithmetic — dow = (day+3) mod 7, hour from the
    * intra-day remainder — counts plus one exact-int share divide.
    * The ops dashboard's load matrix and the input a capacity planner
    * bins traffic by.
    *
    * Scale shape: one map-side pass partial-aggregates to ≤168 cells;
    * the share window runs on those 168 rows. Nothing scales with the
    * data but the first reduce.
    */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    Tables(spark, dir).events
      .groupBy(
        expr(s"CAST((ts_us div $DayUs + 3) % 7 AS INT)").as("dow"),
        expr(s"CAST((ts_us % $DayUs) div 3600000000 AS INT)").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("total", sum(col("n_events")).over(Window.partitionBy()))
      .select(col("dow"), col("hour"), col("n_events"),
        expr("CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE)").as("share"))
      .orderBy("dow", "hour")
  }

  val activityHeatmapSql: String =
    """WITH c AS (
      |  SELECT CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INTEGER) AS dow,
      |    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INTEGER) AS hour,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT dow, hour, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_events AS DOUBLE) / CAST(sum(n_events) OVER () AS DOUBLE) AS share
      |FROM c ORDER BY dow, hour""".stripMargin

  // -------------------------------------------------------- run_length_encode

  /** Run-length compression of per-user event streams: consecutive
    * same-type events collapse into runs (change-flag + prefix-sum
    * run ids — the `sessionize`/`gap_islands` island primitive applied
    * to VALUE change instead of time gaps), then per-type run stats.
    * The avg is one exact-integer division; ties in the stream order
    * broken by event_id on both engines (the house ts convention).
    *
    * Scale shape: both windows and the run group-by are partitioned
    * by user_id — one shuffle end to end, then a ≤|types| rollup.
    * This is the event-compression pass a feature pipeline runs
    * before sequence models (dedup bursts, keep transition structure).
    */
  def runLengthEncode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val runs = Tables(spark, dir).events
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull
          || lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(count(lit(1)).as("len"))
    runs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_runs"), max(col("len")).as("max_run_len"),
        sum(col("len")).as("n_events"))
      .select(col("event_type"), col("n_runs"), col("max_run_len"), col("n_events"),
        expr("CAST(n_events AS DOUBLE) / CAST(n_runs AS DOUBLE)").as("avg_run_len"))
      .orderBy("event_type")
  }

  val runLengthEncodeSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      |  FROM events),
      |f AS (
      |  SELECT *,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM o
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |rid AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM f),
      |runs AS (
      |  SELECT user_id, run_id, event_type, count(*) AS len
      |  FROM rid GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
      |  CAST(max(len) AS BIGINT) AS max_run_len,
      |  CAST(sum(len) AS BIGINT) AS n_events,
      |  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_run_len
      |FROM runs GROUP BY event_type ORDER BY event_type""".stripMargin

  val weightedMedianSql: String =
    """WITH g AS (
      |  SELECT l_returnflag, l_extendedprice AS price,
      |    sum(CAST(l_quantity * 100 AS BIGINT)) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT *,
      |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(w) OVER (PARTITION BY l_returnflag) AS total
      |  FROM g)
      |SELECT l_returnflag, CAST(min(price) AS DOUBLE) AS wmedian_price,
      |  CAST(max(total) AS BIGINT) AS total_weight_x100
      |FROM c WHERE cum * 2 >= total
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------- popularity_fallback_recs

  private val FallbackK = 10
  private val FallbackRecentDays = 90

  /** Popularity fallback for cold/dormant users — the third leg of
    * the recommender stack (`cooccur_recs` and `itemitem_cf` need
    * history; a user with none, or stale history, gets the trailing
    * -90-day bestseller list): top-[[FallbackK]] parts by recent
    * order-line count, alongside the dormant-user audience size the
    * list would serve (no order in the trailing window — the
    * re-engagement campaign's target segment). Deterministic ranking
    * (count desc, part id); all counts exact.
    *
    * Scale shape: the recency filter prunes the fact scan (predicate
    * pushdown against the anchor broadcast); the part rollup is
    * catalog-bounded and its top-k a single rank window over that
    * bounded frame; the audience count is one anti-join-shaped
    * conditional aggregate on the customer grain.
    */
  def popularityFallbackRecs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val anchor = t.orders.agg(max(col("o_orderdate").cast("date")).as("hi"))
      .select(date_sub(col("hi"), FallbackRecentDays).as("cutoff"))
    val recentOrders = t.orders.crossJoin(broadcast(anchor))
      .filter(col("o_orderdate").cast("date") >= col("cutoff"))
    val topParts = t.lineitem
      .join(recentOrders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_recent_lines"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_recent_lines").desc, col("l_partkey"))))
      .filter(col("rank") <= FallbackK)
    val dormant = t.customer.join(
        recentOrders.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_dormant_customers"))
    topParts.crossJoin(broadcast(dormant))
      .select(col("rank"), col("l_partkey").as("part_key"),
        col("n_recent_lines"), col("n_dormant_customers"))
      .orderBy("rank")
  }

  val popularityFallbackRecsSql: String =
    s"""WITH a AS (
       |  SELECT max(CAST(o_orderdate AS DATE)) - $FallbackRecentDays AS cutoff
       |  FROM orders),
       |recent AS (
       |  SELECT o_orderkey, o_custkey FROM orders, a
       |  WHERE CAST(o_orderdate AS DATE) >= cutoff),
       |tp AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_recent_lines
       |  FROM lineitem JOIN recent ON l_orderkey = o_orderkey
       |  GROUP BY 1),
       |rk AS (
       |  SELECT *, row_number() OVER (ORDER BY n_recent_lines DESC, l_partkey) AS rank
       |  FROM tp),
       |dorm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_dormant_customers
       |  FROM customer
       |  WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM recent))
       |SELECT CAST(rank AS INTEGER) AS rank, l_partkey AS part_key,
       |  n_recent_lines, n_dormant_customers
       |FROM rk, dorm WHERE rank <= $FallbackK
       |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------- stickiness_ratio

  /** DAU/WAU stickiness per ISO week (Monday-truncated on both
    * engines): Σ-of-daily-distinct over observed-days × weekly
    * -distinct — the engagement-frequency KPI (1/days_obs = everyone
    * once a week, 1.0 = everyone every day). Both distinct counts are
    * exact; the ratio is one division. Partial trailing weeks
    * normalize by their OBSERVED day count, not 7, so the boundary
    * weeks don't read as artificially sticky/slack.
    *
    * Scale shape: two partial-agg distinct passes over (user, day) /
    * (user, week) — the `active_users_window` shuffle grain — then a
    * week-grain join of two calendar-bounded frames.
    */
  def stickinessRatio(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir).events
      .select(col("user_id"),
        expr("CAST(to_date(timestamp_micros(ts_us)) AS DATE)").as("d"))
      .withColumn("week", expr("CAST(date_trunc('week', d) AS DATE)"))
    val daily = days.groupBy(col("week"), col("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("days_obs"), sum(col("dau")).as("dau_sum"))
    val weekly = days.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    daily.join(weekly, "week")
      .select(col("week").cast("string").as("week_start"),
        col("days_obs"), col("dau_sum"), col("wau"),
        expr("CAST(dau_sum AS DOUBLE) / CAST(days_obs * wau AS DOUBLE)")
          .as("stickiness"))
      .orderBy("week_start")
  }

  val stickinessRatioSql: String =
    """WITH days AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
      |  FROM events),
      |daily AS (
      |  SELECT week, CAST(count(*) AS BIGINT) AS days_obs,
      |    CAST(sum(dau) AS BIGINT) AS dau_sum FROM (
      |    SELECT week, d, count(DISTINCT user_id) AS dau
      |    FROM days GROUP BY 1, 2)
      |  GROUP BY week),
      |weekly AS (
      |  SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM days GROUP BY 1)
      |SELECT CAST(daily.week AS VARCHAR) AS week_start,
      |  days_obs, dau_sum, wau,
      |  CAST(dau_sum AS DOUBLE) / CAST(days_obs * wau AS DOUBLE) AS stickiness
      |FROM daily JOIN weekly ON daily.week = weekly.week
      |ORDER BY week_start""".stripMargin

  // ------------------------------------------------- session_duration_profile

  /** The size-band CASE shared by both engines. */
  private val SessBandExpr: String =
    "CASE WHEN n_events = 1 THEN 'a_single' WHEN n_events <= 5 THEN 'b_short'" +
      " ELSE 'c_long' END"

  /** Session-duration profile by session size band — the engagement
    * depth read on top of `sessionize` (single-hit bounces vs short
    * visits vs long sessions, with how long each cohort actually
    * stays): mean via one exact division, median and disc-p90 as
    * order statistics over exact µs durations (integer positions, the
    * `repeat_purchase_interval` convention). Single-event sessions
    * have duration 0 by construction — kept, because the bounce band
    * IS the point.
    *
    * Scale shape: inherits sessionize's user-partitioned shuffle; the
    * rank window partitions by the ≤3 bands over the session-grain
    * frame (range-partitionable), and the rollup is ≤3 rows.
    */
  def sessionDurationProfile(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionize(spark, dir)
      .select(col("n_events"),
        (col("session_end_us") - col("session_start_us")).as("dur_us"))
      .withColumn("band", expr(SessBandExpr))
    val ranked = sess
      .withColumn("rn", row_number().over(
        Window.partitionBy("band").orderBy(col("dur_us"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("band")))
    ranked.groupBy(col("band"))
      .agg(max(col("n")).as("n_sessions"),
        sum(col("dur_us")).as("dsum"),
        sum(when(col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(n + 2) div 2"), col("dur_us"))).as("msum"),
        sum(when(col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(n + 2) div 2"), 1L).otherwise(0L)).as("mcnt"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("dur_us"))).as("p90_dur_us"))
      .select(col("band"), col("n_sessions"),
        expr("CAST(dsum AS DOUBLE) / CAST(n_sessions AS DOUBLE) / CAST(1000000 AS DOUBLE)")
          .as("mean_dur_sec"),
        expr("CAST(msum AS DOUBLE) / CAST(mcnt AS DOUBLE) / CAST(1000000 AS DOUBLE)")
          .as("median_dur_sec"),
        col("p90_dur_us"))
      .orderBy("band")
  }

  val sessionDurationProfileSql: String =
    s"""WITH sess AS ($sessionizeSql),
       |d AS (
       |  SELECT n_events, session_end_us - session_start_us AS dur_us,
       |    $SessBandExpr AS band
       |  FROM sess),
       |r AS (
       |  SELECT band, dur_us,
       |    row_number() OVER (PARTITION BY band ORDER BY dur_us) AS rn,
       |    count(*) OVER (PARTITION BY band) AS n
       |  FROM d)
       |SELECT band, CAST(max(n) AS BIGINT) AS n_sessions,
       |  CAST(sum(dur_us) AS DOUBLE) / CAST(max(n) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS mean_dur_sec,
       |  CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN dur_us END) AS DOUBLE)
       |    / CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(1000000 AS DOUBLE) AS median_dur_sec,
       |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_us END) AS BIGINT) AS p90_dur_us
       |FROM r GROUP BY band
       |ORDER BY band""".stripMargin

  // ---------------------------------------------------- user_event_diversity

  /** Gini–Simpson diversity 1 − Σ(cᵢ/n)² from per-user exact integer
    * type counts — cast each moment to DOUBLE individually (Σcᵢ² and
    * n² both well under 2^53 at per-user grain).
    */
  private val DiversityExpr =
    "1 - CAST(cc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"

  /** Behavioral-diversity profile: each user's event-type mix scored
    * by Gini–Simpson diversity 1 − Σpᵢ² (0 = single-type specialist,
    * → 0.8 = uniform over the 5 types), bucketed into percent bands (floor(d·100) — the observed spread is narrow, so tenths would collapse the profile) — the
    * "are our actives monocultures or explorers" engagement read
    * `stickiness_ratio` (how often) and `session_duration_profile`
    * (how long) don't answer. Quadratic (q=2) diversity is chosen
    * over Shannon entropy deliberately: it needs no log, so the
    * whole statistic stays in the exact-integer + shared-IEEE-text
    * regime ([[DiversityExpr]]) — same reasoning as `tv_distance_drift`
    * vs KL. Band edges compare identical double bits, so bucketing
    * is deterministic.
    *
    * Scale shape: (user, type) partial-agg → user-grain Σc² reduce —
    * two co-partitioned user-keyed shuffles — then a 10-row band
    * aggregate; the per-band mean is a round-then-decimal sum (d ≤ 1,
    * far inside the 9-dp double grid).
    */
  def userEventDiversity(spark: SparkSession, dir: String): DataFrame = {
    val byType = Tables(spark, dir).events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val byUser = byType.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("c")).as("cc"),
        count(lit(1)).as("n_types"))
    byUser
      .withColumn("d", expr(DiversityExpr))
      .withColumn("band", expr("CAST(floor(d * 100) AS INTEGER)"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        avg(col("n_types").cast("double")).as("avg_types"),
        sum(expr("CAST(round(d, 9) AS DECIMAL(18,9))")).as("sd"))
      .selectExpr("band",
        "CAST(n_users AS BIGINT) AS n_users",
        "avg_types",
        "CAST(sd AS DOUBLE) / CAST(n_users AS DOUBLE) AS avg_diversity")
      .orderBy("band")
  }

  val userEventDiversitySql: String =
    s"""WITH bt AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |bu AS (
       |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(c * c) AS BIGINT) AS cc,
       |    CAST(count(*) AS BIGINT) AS n_types
       |  FROM bt GROUP BY 1),
       |d AS (
       |  SELECT user_id, n_types, $DiversityExpr AS d FROM bu),
       |b AS (
       |  SELECT CAST(floor(d * 100) AS INTEGER) AS band, n_types, d FROM d)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_users,
       |  avg(CAST(n_types AS DOUBLE)) AS avg_types,
       |  CAST(sum(CAST(round(d, 9) AS DECIMAL(18,9))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS avg_diversity
       |FROM b GROUP BY band ORDER BY band""".stripMargin
}
