package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming over the event-log schema (SURVEY.md §2 K) —
  * the continuous-ingest half of the reference pipeline (the MongoDB
  * `summary` collection is an always-appending event stream that the
  * reference batch-dumps; here it's consumed incrementally).
  *
  * Timestamps arrive as epoch micros (long) to match the batch-side
  * `events.ts_us` convention.
  */
object EventStream {

  /** Schema of a streamed event file (JSONL), epoch-micros timestamps. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Watermarked tumbling-window aggregation: events-per-type-per-5min.
    * The watermark bounds state: at 1000 executors the state store only
    * holds windows newer than (max event time − 10 min).
    */
  def windowedCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(inputDir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("value_sum"))

  /** Stream-static enrichment: broadcast-join each micro-batch against
    * a static dimension (the streaming face of `lookup_enrich`). The
    * static side is planned once and broadcast, so every micro-batch
    * is a map-only pass — no stream-side shuffle, no state store.
    * Left join: events for unknown keys pass through with null
    * attributes instead of silently dropping (late-arriving dims).
    */
  def enrichStream(spark: SparkSession, inputDir: String, dim: DataFrame,
      dimKey: String, dimCols: Seq[String]): DataFrame = {
    val d = broadcast(dim.select((dimKey +: dimCols).map(col): _*))
    spark.readStream.schema(eventSchema).json(inputDir)
      .join(d, col("user_id") === col(dimKey), "left")
      .select((Seq("event_id", "ts_us", "user_id", "event_type") ++ dimCols).map(col): _*)
  }

  /** Stream-stream interval join: clicks ⋈ purchases per user where
    * the purchase lands in (click, click + 10 min] — the attribution
    * join, streaming end to end. Watermarks on BOTH sides plus the
    * interval condition let Spark bound the join state (each side
    * evicts rows older than watermark − interval), so state stays
    * finite at any scale; an unbounded stream-stream equi-join without
    * the time bound would grow forever.
    */
  def intervalJoinStream(spark: SparkSession, clicksDir: String,
      purchasesDir: String): DataFrame = {
    val clicks = spark.readStream.schema(eventSchema).json(clicksDir)
      .withColumn("cts", timestamp_micros(col("ts_us")))
      .withWatermark("cts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("cts"))
    val purchases = spark.readStream.schema(eventSchema).json(purchasesDir)
      .withColumn("pts", timestamp_micros(col("ts_us")))
      .withWatermark("pts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("pts"))
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("interval 10 minutes"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
  }

  /** LEFT OUTER stream-stream interval join: the attribution join's
    * semantically hard half — every click emits, purchase columns null
    * when no purchase landed in (click, click + 10 min]. An unmatched
    * click cannot emit eagerly (its match may still arrive), so it
    * surfaces exactly once, LATER, when the global watermark (min over
    * both sources of max-event-time − delay) passes the end of its
    * match interval and the state store evicts it — i.e. null-padded
    * outer results ride the micro-batch AFTER the watermark advances,
    * not the batch that read the click. Same bounded state as the
    * inner variant; the null padding adds nothing to state size.
    */
  def intervalJoinLeftOuterStream(spark: SparkSession, clicksDir: String,
      purchasesDir: String): DataFrame = {
    val clicks = spark.readStream.schema(eventSchema).json(clicksDir)
      .withColumn("cts", timestamp_micros(col("ts_us")))
      .withWatermark("cts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("cts"))
    val purchases = spark.readStream.schema(eventSchema).json(purchasesDir)
      .withColumn("pts", timestamp_micros(col("ts_us")))
      .withWatermark("pts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("pts"))
    clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("interval 10 minutes"),
        "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Streaming heavy hitters: a per-event-type SpaceSaving top-k
    * summary maintained ACROSS micro-batches — the streaming face of
    * the batch `spacesaving_topk` query. The aggregation buffer IS
    * the state: the store holds one ≤k-counter summary per type
    * (O(groups·k) forever — exact streaming top-k would need every
    * key in state), and the TypedImperativeAggregate's merge is the
    * mergeable-summaries combine, so the est ∈ [true, true+err]
    * guarantee holds over the CONCATENATED stream after any number of
    * batches; in the no-eviction regime (≤ k distinct keys per group)
    * the summary is exact and bit-equal to the batch aggregate.
    */
  def heavyHittersStream(spark: SparkSession, inputDir: String,
      k: Int = 16): DataFrame = {
    graft.functions.SpaceSaving.register(spark)
    spark.readStream.schema(eventSchema).json(inputDir)
      .groupBy(col("event_type"))
      .agg(expr(s"graft_spacesaving($k, user_id)").as("hh"))
  }

  /** Streaming exact dedup: suppress event_id replays within the
    * watermark horizon — the streaming face of the batch dedup suite
    * (state store holds only ids newer than watermark − 30 min, so
    * state is bounded at any scale).
    */
  def dedupStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(inputDir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
        col("value"))

  final case class Ev(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(events: Seq[(Long, Double)]) // (ts_us, value)
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, value_sum: Double)

  private val GapUs = 30L * 60 * 1000000

  /** Stateful sessionization via flatMapGroupsWithState: per user,
    * buffer events; on each trigger emit every session that is CLOSED
    * (a ≥30-min gap follows it within the buffered data) and keep only
    * the open tail in state. Semantics match the batch
    * `Analytics.sessionize` for closed sessions.
    */
  def sessionizeStream(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    val events = spark.readStream.schema(eventSchema).json(inputDir).as[Ev]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, incoming: Iterator[Ev], state: GroupState[SessionState]) => {
          val prior = if (state.exists) state.get.events else Seq.empty
          val all = (prior ++ incoming.map(e => (e.ts_us, e.value))).sortBy(_._1)
          // split into gap-delimited sessions
          val sessions = all.foldLeft(Vector.empty[Vector[(Long, Double)]]) {
            case (acc, ev) if acc.nonEmpty && ev._1 - acc.last.last._1 <= GapUs =>
              acc.init :+ (acc.last :+ ev)
            case (acc, ev) => acc :+ Vector(ev)
          }
          val (closed, open) = (sessions.dropRight(1), sessions.takeRight(1).flatten)
          state.update(SessionState(open))
          closed.iterator.map(s => Session(user, s.head._1, s.last._1, s.size,
            s.map(_._2).sum))
        })
      .toDF()
  }

  // ----------------------------------------------- transformWithState profile

  final case class ProfileState(n: Long, cents: Long, last_us: Long)
  final case class UserProfile(user_id: Long, n_events: Long,
      value_cents: Long, last_ts_us: Long)

  /** Per-user lifetime profile via `transformWithState` (the Spark 4
    * arbitrary-state API that supersedes flatMapGroupsWithState):
    * ValueState holds (count, exact value cents, last-seen µs); every
    * micro-batch emits the UPDATED profile row for each touched user —
    * the streaming feature-store primitive (a training pipeline joins
    * these continuously-maintained features at serve time). Value
    * math is exact integer cents (`round(value·100)`), matching the
    * batch engine's money discipline.
    */
  class RunningProfileProcessor extends StatefulProcessor[Long, Ev, UserProfile] {
    @transient private var state: ValueState[ProfileState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ProfileState]("profile",
        Encoders.product[ProfileState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserProfile] = {
      val prior = if (state.exists()) state.get() else ProfileState(0L, 0L, 0L)
      var (n, c, last) = (prior.n, prior.cents, prior.last_us)
      rows.foreach { e =>
        n += 1; c += math.round(e.value * 100); last = math.max(last, e.ts_us)
      }
      state.update(ProfileState(n, c, last))
      Iterator.single(UserProfile(key, n, c, last))
    }
  }

  /** `transformWithState` requires the RocksDB state store provider
    * (set here; the bundled rocksdbjni backs it). TimeMode.None: the
    * profile never expires — production would set a TTLConfig to
    * bound state by the feature-freshness horizon instead.
    *
    * Scale shape: state is one fixed-width row per user, hash-
    * partitioned by the group key across executors — the state store
    * scales horizontally and each micro-batch touches only the
    * partitions holding updated users; checkpoint/changelog IO is
    * O(touched users), not O(all users).
    */
  def runningProfileStream(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.readStream.schema(eventSchema).json(inputDir).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new RunningProfileProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  // ------------------------------------------------- stream-stream as-of join

  /** Schema of a streamed order file (JSONL): the build side of the
    * streaming as-of join — user key, order time (epoch µs), order key.
    */
  val orderSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts_us", LongType),
    StructField("ord_key", LongType)))

  /** Tagged union row of the two as-of input streams (is_event 0 =
    * order/build side, 1 = event/probe side; the unused field of each
    * side carries -1).
    */
  final case class AsOfIn(uid: Long, ts_us: Long, is_event: Int,
      ord_key: Long, event_id: Long)
  final case class AsOfMatch(event_id: Long, user_id: Long,
      last_order_key: Option[Long], last_order_ts_us: Option[Long])
  final case class LastOrder(ts_us: Long, ord_key: Long)

  /** Per-user most-recent-order state machine behind
    * [[asofJoinStream]]: within a micro-batch, rows replay in the
    * batch engine's as-of sort (ts, then orders-before-events at equal
    * ts — inclusive match — then ord_key so the max key wins among
    * equal-time orders); each order advances the O(1) ValueState iff
    * it is (ts, key)-newer, each event emits the state as its match.
    */
  class StreamAsOfProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, AsOfIn, AsOfMatch] {
    @transient private var last: ValueState[LastOrder] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastOrder]("last_order",
        Encoders.product[LastOrder], ttl)
    override def handleInputRows(key: Long, rows: Iterator[AsOfIn],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.is_event, r.ord_key))
      var cur = if (last.exists()) Option(last.get()) else None
      val out = Vector.newBuilder[AsOfMatch]
      sorted.foreach { r =>
        if (r.is_event == 0) {
          if (cur.forall(c => r.ts_us > c.ts_us ||
              (r.ts_us == c.ts_us && r.ord_key > c.ord_key)))
            cur = Some(LastOrder(r.ts_us, r.ord_key))
        } else {
          out += AsOfMatch(r.event_id, key, cur.map(_.ord_key), cur.map(_.ts_us))
        }
      }
      cur.foreach(last.update)
      out.result().iterator
    }
  }

  /** Stream-stream AS-OF join via `transformWithState`: for every
    * probe event, the user's most recent order at or before the event
    * time — the streaming face of the `graft.plans.AsOfJoin` batch
    * family (VERDICT r9 #5), pinned row-for-row against batch
    * `asof_event_order` on the same data split into micro-batches
    * (Round10Spec).
    *
    * Where Spark's built-in stream-stream join buffers BOTH sides'
    * rows inside the join interval, the as-of shape needs only the
    * single most-recent build row per key: state is one fixed-width
    * `LastOrder` per user, hash-partitioned across executors, and a
    * micro-batch's work is O(rows in batch) regardless of history.
    * Pass a [[TTLConfig]] to bound state by freshness at scale
    * (expired users simply match nothing — the left-outer
    * convention); TTL eviction is the state-store's job, not a
    * correctness input, so tests run TTL-free.
    *
    * Ordering contract: within a micro-batch, arrival order is
    * irrelevant (the processor replays the batch as-of sort); across
    * micro-batches, a build row must not arrive in a LATER batch than
    * a probe row it should match — the same monotonicity a watermark
    * would enforce, delegated to the feed (the test splits by time).
    */
  def asofJoinStream(spark: SparkSession, eventsDir: String, ordersDir: String,
      ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val orders = spark.readStream.schema(orderSchema).json(ordersDir)
      .select(col("user_id").as("uid"), col("ts_us"),
        lit(0).as("is_event"), col("ord_key"), lit(-1L).as("event_id"))
    val events = spark.readStream.schema(eventSchema).json(eventsDir)
      .select(col("user_id").as("uid"), col("ts_us"),
        lit(1).as("is_event"), lit(-1L).as("ord_key"), col("event_id"))
    orders.unionByName(events).as[AsOfIn]
      .groupByKey(_.uid)
      .transformWithState(new StreamAsOfProcessor(ttl),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
