package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators (SURVEY.md §2 C/J): the
  * merge/CDC/diff primitives a warehouse uses to keep dimensions and
  * snapshots current between full rebuilds — the batch core of the
  * reference's incremental load path (ref:
  * `6.data-pipeline-storage/trigger_bigquery_load.py`, which appends
  * date partitions, and the dbt project's snapshot machinery).
  *
  * Scale notes: every operator here is a single key-partitioned
  * shuffle (full-outer join or one window) over pre-projected narrow
  * columns — no driver-side state, no iteration. The change/source
  * side is typically ≪ the target at 100 TB; Catalyst's AQE picks the
  * broadcast side at runtime where the static plan can't know it.
  */
object Incremental {

  /** SCD Type-1 MERGE (upsert): apply the latest per-key change record
    * to a target dimension — matched keys update in place, unmatched
    * source keys insert, untouched target rows carry forward. One
    * full-outer join on the key; the "latest change" pre-step is a
    * newest-per-key window over the change log. The target is
    * restricted to keys ≥ 10 so all three merge actions actually
    * occur at every scale factor (keys < 10 arrive only via the
    * source = late-arriving dimension members).
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val target = t.customer.filter(col("c_custkey") >= 10)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val src = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"), col("ts_us"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("value"))
    target.join(src, col("user_id") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("user_id")).as("c_custkey"),
        col("c_name"),
        coalesce(col("value"), col("c_acctbal")).as("balance"),
        when(col("c_custkey").isNull, "insert")
          .when(col("user_id").isNull, "keep")
          .otherwise("update").as("merge_action"))
      .orderBy("c_custkey")
  }

  val mergeUpsertSql: String =
    """WITH src AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value,
      |      row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase') t WHERE rn = 1),
      |tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey >= 10)
      |SELECT coalesce(t.c_custkey, s.user_id) AS c_custkey,
      |  t.c_name,
      |  coalesce(s.value, t.c_acctbal) AS balance,
      |  CASE WHEN t.c_custkey IS NULL THEN 'insert'
      |       WHEN s.user_id IS NULL THEN 'keep' ELSE 'update' END AS merge_action
      |FROM tgt t FULL OUTER JOIN src s ON s.user_id = t.c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** CDC apply: collapse an ordered change log (insert/update/delete
    * ops derived from the event stream) to the final table state — the
    * standard "replay the binlog" batch primitive. Latest op per key
    * wins (one window over (ts, event_id)); keys whose last op is a
    * delete vanish from the output. Op mapping on this schema:
    * signup→I, error→D, everything else→U.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables(spark, dir).events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("op").as("last_op"),
        col("value").as("last_value"), col("ts_us").as("last_ts_us"))
      .orderBy("user_id")
  }

  val cdcApplySql: String =
    """WITH log AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
      |    CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op
      |  FROM events),
      |last AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM log)
      |SELECT user_id, op AS last_op, value AS last_value, ts_us AS last_ts_us
      |FROM last WHERE rn = 1 AND op != 'D' ORDER BY user_id""".stripMargin

  /** Snapshot diff: compare two as-of aggregates of the same fact
    * stream (per-customer order counts/amounts at two cutoff dates)
    * and classify every key as added / changed / unchanged — the audit
    * primitive behind incremental-load validation. ("removed" cannot
    * occur for as-of cutoffs over append-only facts, so the one-scan
    * form below doesn't emit it; diffing two INDEPENDENT snapshots
    * would use the mergeUpsert full-outer shape instead.) Both
    * snapshots come off ONE scan (conditional aggregation on the
    * earlier cutoff); amounts compare exactly because both sides are
    * decimal sums.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.money
    val cut1 = lit("1999-01-01").cast("timestamp")
    val cut2 = lit("2000-01-01").cast("timestamp")
    val t = Tables(spark, dir)
    val s = t.orders.filter(col("o_orderdate") < cut2)
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("o_orderdate") < cut1, 1).otherwise(0)).as("n1"),
        sum(when(col("o_orderdate") < cut1, money(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("amt1"),
        count(lit(1)).as("n2"),
        sum(money(col("o_totalprice"))).cast("double").as("amt2"))
    s.select(col("o_custkey").as("custkey"),
        when(col("n1") === 0, "added")
          .when(col("n1") =!= col("n2") || col("amt1") =!= col("amt2"), "changed")
          .otherwise("unchanged").as("diff_status"),
        col("n1").as("n_orders_before"), col("n2").as("n_orders_after"))
      .orderBy("custkey")
  }

  val snapshotDiffSql: String =
    """WITH s AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS n1,
      |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01'
      |             THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS amt1,
      |    count(*) AS n2,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amt2
      |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01' GROUP BY o_custkey)
      |SELECT o_custkey AS custkey,
      |  CASE WHEN n1 = 0 THEN 'added'
      |       WHEN n1 != n2 OR amt1 != amt2 THEN 'changed'
      |       ELSE 'unchanged' END AS diff_status,
      |  CAST(n1 AS BIGINT) AS n_orders_before, n2 AS n_orders_after
      |FROM s ORDER BY custkey""".stripMargin

  // 2024-01-16T00:00:00Z: splits the 30-day event window in half
  private[graft] val Scd2CutoffUs = 1705363200000000L

  /** Per-user state-change points (consecutive-distinct collapse) of
    * an event slice — the shared first stage of both SCD2 paths.
    */
  private def changePoints(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .drop("prev_state")
  }

  /** INCREMENTAL SCD2 maintenance — apply a change batch to an
    * existing SCD2 dimension instead of rebuilding history: close each
    * affected user's open row at the first genuine new change, append
    * the new versioned rows, pass untouched history through. The
    * existing dim is the SCD2 build of the pre-cutoff event slice; the
    * batch is the post-cutoff slice — and the result must be
    * BIT-IDENTICAL to the full rebuild over the whole stream, so the
    * oracle is `scd2HistorySql` itself: two entirely different
    * computation paths (incremental apply vs full-history windows),
    * one hash. The boundary subtleties the equality proves out: a
    * batch's leading change is dropped when it repeats the dim's
    * current state; versions continue from the current row's; users
    * new in the batch start at version 1; users absent from the batch
    * keep their open row.
    *
    * Scale shape: windows are user-partitioned; the dim⋈batch joins
    * are key-partitioned shuffles with the batch side typically ≪ the
    * dim (AQE promotes when it fits). Nothing driver-side, no
    * iteration.
    */
  def scd2Apply(spark: SparkSession, dir: String): DataFrame =
    scd2ApplyOn(Tables(spark, dir).events
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type")))
      .select(
        col("user_id").cast("string").as("customer_source_id"),
        col("state"), col("valid_from_us"), col("valid_to_us"), col("version"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("customer_source_id", "version")

  /** The apply core over an arbitrary (user_id, ts_us, event_id,
    * event_type) stream — exposed so randomized tests can drive it
    * with synthetic boundary-case streams.
    */
  private[graft] def scd2ApplyOn(ev: DataFrame): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    // the "existing" dimension: full SCD2 of the pre-cutoff slice
    val dim = changePoints(ev.filter(col("ts_us") < Scd2CutoffUs))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wUser))
      .withColumn("version", row_number().over(wUser))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"), col("version"))
    val cur = dim.filter(col("valid_to_us").isNull)
      .select(col("user_id"), col("state").as("cur_state"),
        col("version").as("cur_version"))
    // batch changes: consecutive-distinct within the post-cutoff
    // slice; only the FIRST one can repeat the dim's current state
    // (its true predecessor lives across the boundary) — drop it then
    val batch = changePoints(ev.filter(col("ts_us") >= Scd2CutoffUs))
      .withColumn("bpos", row_number().over(wUser))
      .join(cur, Seq("user_id"), "left")
      .filter(!(col("bpos") === 1 && col("cur_state").isNotNull &&
        col("cur_state") === col("event_type")))
    val newRows = batch
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wUser))
      .withColumn("version",
        coalesce(col("cur_version"), lit(0)) + row_number().over(wUser))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"), col("version"))
    // close the open row of every user that gained a new version
    val firstNew = newRows.groupBy("user_id")
      .agg(min(col("valid_from_us")).as("close_ts"))
    dim.join(firstNew, Seq("user_id"), "left")
      .select(col("user_id"), col("state"), col("valid_from_us"),
        when(col("valid_to_us").isNull && col("close_ts").isNotNull, col("close_ts"))
          .otherwise(col("valid_to_us")).as("valid_to_us"),
        col("version"))
      .unionByName(newRows)
  }

  /** Cutoff splitting the order log into the "materialized" history
    * and the incoming delta for [[mvRefresh]] — both sides are
    * non-empty on the driver's 1995–2001 order dates.
    */
  private[graft] val MvCutoff = "1998-01-01"

  /** Incremental materialized-view refresh: a per-customer order
    * aggregate (count + exact-decimal revenue) maintained by MERGING a
    * delta batch's partial aggregate into the existing view instead of
    * rebuilding — `merge(agg(A), agg(B)) = agg(A ∪ B)` because count
    * and decimal sum are commutative monoids (the same law behind
    * Spark's map-side partial aggregation, applied across TIME rather
    * than across partitions). The oracle is the FULL aggregate over
    * the entire order log: two computation paths, one hash — exactly
    * the `scd2_apply` gating pattern.
    *
    * Scale shape: the view and the delta aggregate shuffle on the same
    * customer key, so the full-outer merge join arrives co-partitioned;
    * per-refresh work is O(delta) + O(touched view rows), never a
    * rescan of history — the reason warehouses incrementally maintain
    * their serving aggregates (ref: `trigger_bigquery_load.py`'s
    * per-date incremental loads feeding dashboard tables).
    */
  def mvRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.money
    val t = Tables(spark, dir)
    val cut = lit(MvCutoff).cast("timestamp")
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(money(col("o_totalprice"))).as("rev"))
    val view = agg(t.orders.filter(col("o_orderdate") < cut))
      .select(col("o_custkey").as("v_key"), col("n_orders").as("v_n"), col("rev").as("v_rev"))
    val delta = agg(t.orders.filter(col("o_orderdate") >= cut))
    view.join(delta, col("v_key") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("v_key")).as("o_custkey"),
        (coalesce(col("v_n"), lit(0L)) + coalesce(col("n_orders"), lit(0L))).as("n_orders"),
        (coalesce(col("v_rev"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("rev"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("o_custkey")
  }

  /** Full-rebuild oracle: the merged view must equal the aggregate
    * over the whole log.
    */
  val mvRefreshSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------- delete_propagate

  /** Deterministic pseudo-batch of erasure requests: every 97th
    * customer key (≈1% of the dimension) plays the role of the
    * right-to-be-forgotten queue a real pipeline drains.
    */
  private val ErasureModulus = 97

  /** Core of [[deletePropagate]], factored over explicit frames so
    * the idempotence test can re-apply the cascade to its own output:
    * given the current (customer, orders, lineitem) state and a batch
    * of customer keys to erase, returns the per-table rebuilt frames.
    * The cascade is DELETE-driven: each table anti-joins the (small)
    * deleted-key set of its parent — the deletion batch and its order
    * fan-out broadcast, so 100 TB of facts shed rows in one map-side
    * pass each, never a shuffle of the surviving 99%.
    */
  private[graft] def deleteCascade(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val keys = broadcast(batch.select(col("del_key")))
    val custAfter = customer.join(keys,
      col("c_custkey") === col("del_key"), "left_anti")
    val deadOrders = broadcast(orders.join(keys,
      col("o_custkey") === col("del_key"), "left_semi")
      .select(col("o_orderkey").as("dead_okey")))
    val ordAfter = orders.join(keys,
      col("o_custkey") === col("del_key"), "left_anti")
    val liAfter = lineitem.join(deadOrders,
      col("l_orderkey") === col("dead_okey"), "left_anti")
    (custAfter, ordAfter, liAfter)
  }

  /** GDPR-style delete propagation (VERDICT r9 #4): cascade a batch
    * of customer-erasure requests through the dimension and the fact
    * web (customer → orders → lineitem), emitting the per-table audit
    * a compliance run files — rows before/deleted/after plus an
    * orphan re-check over the REBUILT frames (surviving orders whose
    * customer is gone, surviving lineitems whose order is gone — both
    * must be 0, the `orphaned_dimensions` FK discipline re-run
    * post-erasure as a live count, not an assumption).
    *
    * Two-paths-one-hash: this side is the delete-driven anti-join
    * cascade; the oracle rebuilds each table keep-driven (`NOT IN
    * batch` / `IN surviving parent`) — agreement of every audit
    * number across the two constructions (and engines) is the
    * correctness argument. Idempotence (re-running the cascade on its
    * own output deletes nothing) is test-pinned in Round10Spec.
    *
    * Scale shape: the erasure batch is requests-sized (≈1% here) —
    * it and its order fan-out broadcast; each table rebuild is one
    * map-side anti-join, audits are count-only partial aggregates,
    * and the output is 3 rows.
    */
  def deletePropagate(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val customer = t.customer
    val orders = t.orders
    val lineitem = t.lineitem
    val batch = customer.filter(col("c_custkey") % ErasureModulus === 0)
      .select(col("c_custkey").as("del_key"))
    val (custAfter, ordAfter, liAfter) =
      deleteCascade(customer, orders, lineitem, batch)
    // orphan re-check over the REBUILT frames (parent-key anti-joins;
    // both 0 when the cascade is complete — computed, not assumed)
    val ordOrphans = ordAfter.join(
      custAfter.select(col("c_custkey").as("pk")),
      col("o_custkey") === col("pk"), "left_anti")
    val liOrphans = liAfter.join(
      ordAfter.select(col("o_orderkey").as("pk")),
      col("l_orderkey") === col("pk"), "left_anti")
    def audit(name: String, before: DataFrame, after: DataFrame,
        orphans: DataFrame): DataFrame =
      before.agg(count(lit(1)).as("rows_before")).crossJoin(
          after.agg(count(lit(1)).as("rows_after"))).crossJoin(
          orphans.agg(count(lit(1)).as("orphans_after")))
        .select(lit(name).as("table_name"), col("rows_before"),
          (col("rows_before") - col("rows_after")).as("rows_deleted"),
          col("rows_after"), col("orphans_after"))
    audit("customer", customer, custAfter, custAfter.limit(0))
      .unionAll(audit("orders", orders, ordAfter, ordOrphans))
      .unionAll(audit("lineitem", lineitem, liAfter, liOrphans))
      .orderBy("table_name")
  }

  /** Keep-driven direct rebuild: each table filtered against the
    * batch / its surviving parent — the independent second
    * construction the anti-join cascade must hash-match.
    */
  val deletePropagateSql: String =
    s"""WITH batch AS (
      |  SELECT c_custkey AS del_key FROM customer
      |  WHERE c_custkey % $ErasureModulus = 0),
      |ca AS (SELECT * FROM customer
      |  WHERE c_custkey NOT IN (SELECT del_key FROM batch)),
      |oa AS (SELECT * FROM orders
      |  WHERE o_custkey NOT IN (SELECT del_key FROM batch)),
      |la AS (SELECT * FROM lineitem
      |  WHERE l_orderkey IN (SELECT o_orderkey FROM oa)),
      |oo AS (SELECT count(*) AS n FROM oa
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM ca)),
      |lo AS (SELECT count(*) AS n FROM la
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oa))
      |SELECT 'customer' AS table_name,
      |  (SELECT count(*) FROM customer) AS rows_before,
      |  (SELECT count(*) FROM customer) - (SELECT count(*) FROM ca) AS rows_deleted,
      |  (SELECT count(*) FROM ca) AS rows_after,
      |  0 AS orphans_after
      |UNION ALL
      |SELECT 'orders',
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM orders) - (SELECT count(*) FROM oa),
      |  (SELECT count(*) FROM oa),
      |  (SELECT n FROM oo)
      |UNION ALL
      |SELECT 'lineitem',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM la),
      |  (SELECT count(*) FROM la),
      |  (SELECT n FROM lo)
      |ORDER BY table_name""".stripMargin

  // ------------------------------------------------------------ compaction_plan

  /** Target rows per compacted output file (stands in for the
    * target-bytes knob of a real table service; rows are the unit the
    * oracle can check exactly).
    */
  private[graft] val CompactionTargetRows = 1000L

  /** Small-file compaction planner — the table-maintenance pass every
    * lakehouse runs over a streaming-ingested events table: per-day
    * ingest partitions (the reference's date-partitioned load unit,
    * `trigger_bigquery_load.py`) bin-pack into target-sized output
    * files by cumulative row count. `file_id = ⌊cum_before/target⌋`
    * over the day-ordered prefix sum — greedy first-fit in ONE window
    * pass, no driver loop; day grain means the plan is reproducible
    * (same input → same file assignment, the idempotence a retry-safe
    * maintenance job needs). All arithmetic integer-exact.
    *
    * Scale shape: one partial-agg pass reduces events to the
    * calendar-bounded day frame; the prefix-sum window runs on that
    * bounded frame (the `sequence_pack` two-level shape applies
    * verbatim if the grain ever outgrows one task); output is
    * ≤ days rows rolled into ≤ ⌈total/target⌉ planned files.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(expr("CAST(to_date(timestamp_micros(ts_us)) AS DATE)").as("d"))
      .agg(count(lit(1)).as("rows"))
    val cum = daily.withColumn("cum_before",
      coalesce(sum(col("rows")).over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.withColumn("file_id", expr(s"cum_before div $CompactionTargetRows"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_day_partitions"),
        sum(col("rows")).as("rows"),
        // ISO strings, not native dates — the compare convention
        min(col("d")).cast("string").as("min_day"),
        max(col("d")).cast("string").as("max_day"))
      .orderBy("file_id")
  }

  val compactionPlanSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS rows
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT d, rows,
       |    CAST(coalesce(sum(rows) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM daily)
       |SELECT cum_before // $CompactionTargetRows AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_day_partitions,
       |  CAST(sum(rows) AS BIGINT) AS rows,
       |  CAST(min(d) AS VARCHAR) AS min_day, CAST(max(d) AS VARCHAR) AS max_day
       |FROM c GROUP BY 1
       |ORDER BY file_id""".stripMargin

  // --------------------------------------------------------- late_dim_backfill

  /** Late-arriving-dimension repair — the warehouse failure mode the
    * reference's fact build guards with coalesce('-1') surrogate
    * keys (`fact_sales_order.sql`'s 5-way coalesce join): fact rows
    * land BEFORE their dimension row exists, take the unknown-member
    * surrogate at load, and a later backfill pass re-joins them
    * against the refreshed dimension. Simulated here with a
    * deterministic late slice (every 10th customer's dim row arrives
    * after the order load); the output is the repair ledger — facts
    * loaded, facts that took '-1', facts the backfill repaired, and
    * the residual unknown count (0 when the dimension caught up) —
    * all exact integer counts plus one coverage division.
    *
    * Scale shape: two fact⋈dim equi-joins (the second over ONLY the
    * '-1' slice — backfill work ∝ late rows, not fact volume) and
    * count aggregates. Identical to the production MERGE-backfill
    * plan shape.
    */
  def lateDimBackfill(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dim = t.customer.select(col("c_custkey"), col("c_mktsegment"))
    val early = dim.filter(col("c_custkey") % 10 =!= 0)
    val facts = t.orders.select(col("o_orderkey"), col("o_custkey"))
    val loaded = facts
      .join(early, col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"),
        coalesce(col("c_mktsegment"), lit("-1")).as("segment_at_load"))
    val missing = loaded.filter(col("segment_at_load") === "-1")
    val repaired = missing
      .join(dim, col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_missing_at_load"),
        sum(when(col("c_mktsegment").isNotNull, 1L).otherwise(0L)).as("n_repaired"))
    loaded.agg(count(lit(1)).as("n_facts")).crossJoin(repaired)
      .select(col("n_facts"), col("n_missing_at_load"), col("n_repaired"),
        (col("n_missing_at_load") - col("n_repaired")).as("n_unresolved"),
        expr("CAST(n_repaired AS DOUBLE) / CAST(n_missing_at_load AS DOUBLE)")
          .as("repair_coverage"))
  }

  val lateDimBackfillSql: String =
    """WITH early AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 10 != 0),
      |loaded AS (
      |  SELECT o.o_orderkey, o.o_custkey,
      |    coalesce(e.c_mktsegment, '-1') AS segment_at_load
      |  FROM orders o LEFT JOIN early e ON e.c_custkey = o.o_custkey),
      |missing AS (SELECT * FROM loaded WHERE segment_at_load = '-1'),
      |rep AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_missing_at_load,
      |    CAST(sum(CASE WHEN c.c_mktsegment IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired
      |  FROM missing m LEFT JOIN customer c ON c.c_custkey = m.o_custkey),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_facts FROM loaded)
      |SELECT n_facts, n_missing_at_load, n_repaired,
      |  n_missing_at_load - n_repaired AS n_unresolved,
      |  CAST(n_repaired AS DOUBLE) / CAST(n_missing_at_load AS DOUBLE) AS repair_coverage
      |FROM tot, rep""".stripMargin

  // ----------------------------------------------------------- zone_map_prune

  /** Rows per simulated insert-order file for the zone-map audit —
    * sized so sf0.01 yields O(10–100) files, like a real writer's
    * rowgroup target. */
  private val ZoneFileSpan = 1024

  /** (label, lo, hi) shipdate predicates the audit evaluates — inside
    * the generator's 1995–2001 order-date range so every predicate
    * exercises real pruning. */
  private val ZonePreds: Seq[(String, String, String)] = Seq(
    ("q1_1996", "1996-01-01", "1996-03-31"),
    ("year_1997", "1997-01-01", "1997-12-31"),
    ("dec_1999", "1999-12-01", "1999-12-31"))

  // predicate bounds as integer day numbers vs the repo's 1990-01-01
  // epoch — computed ONCE driver-side so both engine texts carry the
  // same literals (no engine date arithmetic in the hot path)
  private def zoneDay(s: String): Long =
    java.time.LocalDate.parse(s).toEpochDay -
      java.time.LocalDate.parse("1990-01-01").toEpochDay

  /** Zone-map (min/max) file-skipping audit, BEFORE vs AFTER
    * re-clustering: lineitem rows are binned into "files" two ways —
    * the physical insert order ([[ZoneFileSpan]] order keys per
    * file) and a simulated shipdate re-cluster with the SAME file
    * count — each file keeps a (min, max) shipdate zone, and three
    * date predicates are tested for how many files they PRUNE vs how
    * many rows the surviving files force the scan to read. The
    * layout contrast is the actual decision input: on this
    * generator's data the insert-order layout prunes NOTHING (order
    * keys are date-uncorrelated — `zone_overlap_depth` shows every
    * zone spans the whole range) while the clustered layout prunes
    * to near the predicate's selectivity — the quantified benefit a
    * re-cluster (Delta OPTIMIZE ZORDER / parquet sort) would buy.
    * All counts exact integers; the two ratios are guarded doubles.
    *
    * Scale shape: one pass partial-aggregates BOTH layouts' zone
    * frames (the clustered file id is a map-side integer
    * cross-product off broadcast day bounds) + one conditional-sum
    * pass for per-predicate match counts; predicates evaluate as
    * conditional sums over bounded frames — nothing multiplies row
    * volume.
    */
  def zoneMapPrune(spark: SparkSession, dir: String): DataFrame = {
    val d = "CAST(datediff(CAST(l_shipdate AS DATE), DATE'1990-01-01') AS BIGINT)"
    val li0 = Tables(spark, dir).lineitem
      .select(expr(s"l_orderkey div $ZoneFileSpan").as("fi"), expr(d).as("d"))
    val db = li0.agg(min(col("d")).as("dmn"), max(col("d")).as("dmx"),
      countDistinct(col("fi")).as("nf"))
    val li = li0.crossJoin(broadcast(db))
      .withColumn("fc", expr("((d - dmn) * nf) div (dmx - dmn + 1)"))
    def layoutAgg(name: String, fcol: String): DataFrame = {
      val zones = li.groupBy(col(fcol).as("f"))
        .agg(min(col("d")).as("mn"), max(col("d")).as("mx"),
          count(lit(1)).as("n_rows"))
      val zcols = count(lit(1)).as("n_files") +: sum(col("n_rows")).as("rows_total") +:
        ZonePreds.zipWithIndex.flatMap { case ((_, lo, hi), i) =>
          val ov = s"(mx >= ${zoneDay(lo)} AND mn <= ${zoneDay(hi)})"
          Seq(sum(when(expr(ov), 1L).otherwise(0L)).as(s"sc$i"),
            sum(when(expr(ov), col("n_rows")).otherwise(0L)).as(s"rs$i"))
        }
      zones.agg(zcols.head, zcols.tail: _*).withColumn("layout", lit(name))
    }
    val mcols = ZonePreds.zipWithIndex.map { case ((_, lo, hi), i) =>
      sum(when(expr(s"(d >= ${zoneDay(lo)} AND d <= ${zoneDay(hi)})"), 1L)
        .otherwise(0L)).as(s"mt$i")
    }
    val magg = li0.agg(mcols.head, mcols.tail: _*)
    val stackArgs = ZonePreds.zipWithIndex
      .map { case ((nm, _, _), i) => s"'$nm', sc$i, rs$i, mt$i" }.mkString(", ")
    layoutAgg("insert_order", "fi")
      .unionByName(layoutAgg("clustered_by_date", "fc"))
      .crossJoin(magg)
      .selectExpr("layout", "n_files", "rows_total",
        s"stack(${ZonePreds.size}, $stackArgs) AS (predicate, n_files_scanned, rows_scanned, rows_matching)")
      .selectExpr("layout", "predicate", "CAST(n_files AS BIGINT) AS n_files",
        "CAST(n_files_scanned AS BIGINT) AS n_files_scanned",
        "CAST(n_files - n_files_scanned AS BIGINT) AS n_files_pruned",
        "CAST(n_files - n_files_scanned AS DOUBLE) / CAST(n_files AS DOUBLE) AS prune_ratio",
        "CAST(rows_total AS BIGINT) AS rows_total",
        "CAST(rows_scanned AS BIGINT) AS rows_scanned",
        "CAST(rows_matching AS BIGINT) AS rows_matching",
        """CASE WHEN rows_matching = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(rows_scanned AS DOUBLE) / CAST(rows_matching AS DOUBLE) END AS scan_amplification""".stripMargin)
      .orderBy("layout", "predicate")
  }

  // ------------------------------------------------------- zone_overlap_depth

  /** Clustering-depth profile of the zone maps: a ±1 sweep over the
    * per-file (min, max) shipdate zones yields, for every day in the
    * covered range, HOW MANY file zones contain it — the Delta-Lake
    * "clustering depth" metric that says whether the table is
    * actually clustered on shipdate (depth ≈ 1–2) or interleaved
    * (depth ≈ n_files, every point query touches every file).
    * `zone_map_prune` measures three predicates' outcomes; this
    * measures the LAYOUT property that causes them. Exact integer
    * sweep (+1 at min, −1 at max+1, cumulative over the endpoint
    * spine); one share division.
    *
    * Scale shape: one lineitem partial-agg to the file-grain zone
    * frame; the sweep runs on ≤ 2·files endpoint rows — never on row
    * or day grain.
    */
  def zoneOverlapDepth(spark: SparkSession, dir: String): DataFrame = {
    val d = "CAST(datediff(CAST(l_shipdate AS DATE), DATE'1990-01-01') AS BIGINT)"
    val zones = Tables(spark, dir).lineitem
      .select(expr(s"l_orderkey div $ZoneFileSpan").as("f"), expr(d).as("d"))
      .groupBy(col("f"))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
    val events = zones.select(col("mn").as("day"), lit(1L).as("delta"))
      .unionByName(zones.select((col("mx") + 1).as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    val sweep = events
      .withColumn("depth", sum(col("delta")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nxt", lead(col("day"), 1).over(Window.orderBy("day")))
      .filter(col("nxt").isNotNull && col("depth") >= 1)
      .withColumn("len", expr("nxt - day"))
    sweep.groupBy(col("depth"))
      .agg(count(lit(1)).as("n_segments"), sum(col("len")).as("n_days"))
      .withColumn("tot", sum(col("n_days")).over(Window.partitionBy()))
      .selectExpr("CAST(depth AS BIGINT) AS depth",
        "CAST(n_segments AS BIGINT) AS n_segments",
        "CAST(n_days AS BIGINT) AS n_days",
        "CAST(n_days AS DOUBLE) / CAST(tot AS DOUBLE) AS share_days")
      .orderBy("depth")
  }

  val zoneOverlapDepthSql: String = {
    val dd = "CAST(date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)"
    s"""WITH zones AS (
       |  SELECT l_orderkey // $ZoneFileSpan AS f, min($dd) AS mn, max($dd) AS mx
       |  FROM lineitem GROUP BY 1),
       |events AS (
       |  SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM (
       |    SELECT mn AS day, 1 AS delta FROM zones
       |    UNION ALL SELECT mx + 1, -1 FROM zones) e
       |  GROUP BY 1),
       |sweep AS (
       |  SELECT day,
       |    CAST(sum(delta) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS depth,
       |    lead(day, 1) OVER (ORDER BY day) AS nxt
       |  FROM events),
       |seg AS (
       |  SELECT depth, nxt - day AS len FROM sweep
       |  WHERE nxt IS NOT NULL AND depth >= 1),
       |g AS (
       |  SELECT depth, CAST(count(*) AS BIGINT) AS n_segments,
       |    CAST(sum(len) AS BIGINT) AS n_days
       |  FROM seg GROUP BY 1),
       |t AS (SELECT *, CAST(sum(n_days) OVER () AS BIGINT) AS tot FROM g)
       |SELECT depth, n_segments, n_days,
       |  CAST(n_days AS DOUBLE) / CAST(tot AS DOUBLE) AS share_days
       |FROM t ORDER BY depth""".stripMargin
  }

  val zoneMapPruneSql: String = {
    val dd = "CAST(date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)"
    val zcols = ZonePreds.zipWithIndex.map { case ((_, lo, hi), i) =>
      s"""CAST(sum(CASE WHEN (mx >= ${zoneDay(lo)} AND mn <= ${zoneDay(hi)}) THEN 1 ELSE 0 END) AS BIGINT) AS sc$i,
         |    CAST(sum(CASE WHEN (mx >= ${zoneDay(lo)} AND mn <= ${zoneDay(hi)}) THEN n_rows ELSE 0 END) AS BIGINT) AS rs$i""".stripMargin
    }.mkString(",\n    ")
    val mcols = ZonePreds.zipWithIndex.map { case ((_, lo, hi), i) =>
      s"CAST(sum(CASE WHEN (d >= ${zoneDay(lo)} AND d <= ${zoneDay(hi)}) THEN 1 ELSE 0 END) AS BIGINT) AS mt$i"
    }.mkString(",\n    ")
    val rows = Seq(("insert_order", "i"), ("clustered_by_date", "c")).flatMap {
      case (lname, tag) =>
        ZonePreds.zipWithIndex.map { case ((nm, _, _), i) =>
          s"SELECT '$lname' AS layout, n_files, rows_total, '$nm' AS predicate, sc$i AS n_files_scanned, rs$i AS rows_scanned, mt$i AS rows_matching FROM za_$tag, ma"
        }
    }.mkString("\n  UNION ALL ")
    def za(tag: String, zonesCte: String): String =
      s"""za_$tag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_files,
         |    CAST(sum(n_rows) AS BIGINT) AS rows_total,
         |    $zcols
         |  FROM $zonesCte)""".stripMargin
    s"""WITH z0 AS (
       |  SELECT l_orderkey // $ZoneFileSpan AS fi, $dd AS d
       |  FROM lineitem),
       |db AS (SELECT CAST(min(d) AS BIGINT) AS dmn, CAST(max(d) AS BIGINT) AS dmx,
       |    CAST(count(DISTINCT fi) AS BIGINT) AS nf FROM z0),
       |z AS (SELECT fi, ((d - dmn) * nf) // (dmx - dmn + 1) AS fc, d FROM z0, db),
       |zones_i AS (
       |  SELECT fi AS f, min(d) AS mn, max(d) AS mx, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM z GROUP BY 1),
       |zones_c AS (
       |  SELECT fc AS f, min(d) AS mn, max(d) AS mx, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM z GROUP BY 1),
       |${za("i", "zones_i")},
       |${za("c", "zones_c")},
       |ma AS (
       |  SELECT
       |    $mcols
       |  FROM z0),
       |u AS (
       |  $rows)
       |SELECT layout, predicate, n_files, n_files_scanned,
       |  n_files - n_files_scanned AS n_files_pruned,
       |  CAST(n_files - n_files_scanned AS DOUBLE) / CAST(n_files AS DOUBLE) AS prune_ratio,
       |  rows_total, rows_scanned, rows_matching,
       |  CASE WHEN rows_matching = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(rows_scanned AS DOUBLE) / CAST(rows_matching AS DOUBLE) END AS scan_amplification
       |FROM u ORDER BY layout, predicate""".stripMargin
  }
}
