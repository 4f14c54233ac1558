package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Streaming Page–Hinkley drift monitor — the continuous face of the
  * batch `page_hinkley_drift` operator: a daily-rollup stream (one
  * row per series per day) drives a per-series O(1) state machine
  * (t, Σy, cumulative PH sum, running min), and every day emits the
  * PH statistic with its alarm flag the moment the day arrives —
  * the monitoring page updates per micro-batch instead of per batch
  * job. Arithmetic is bit-identical to the batch op: the running-mean
  * term clears to exact cumulative integers and quantizes to the same
  * 6-dp grid, carried as exact micros in Long state — a streamed
  * series and the batch replay produce byte-equal statistics
  * (spec-pinned), so an alarm means the same thing on both paths.
  *
  * Scale shape: state is one fixed-width row per monitored series,
  * hash-partitioned by series key; a micro-batch's work is O(arriving
  * days). In-batch rows replay in day order (the StreamAsOfProcessor
  * discipline), so replays and late-start backfills are
  * order-insensitive within a batch; cross-batch order is the
  * source's append order, as for any sequential detector.
  */
object DriftMonitor {

  /** Schema of a streamed daily-rollup file (JSONL). */
  val dailySchema: StructType = StructType(Seq(
    StructField("series_id", LongType),
    StructField("d", StringType),
    StructField("y", LongType)))

  final case class DailyIn(series_id: Long, d: String, y: Long)
  /** (m6/mmin6 are the 6-dp-quantized PH sums in exact micros.) */
  final case class PhState(t: Long, cum: Long, m6: Long, mmin6: Long)
  final case class PhOut(series_id: Long, d: String, y: Long,
      ph: Double, alarm: Int)

  /** δ and λ in the batch op's $k units. */
  val DeltaK = 200.0
  val LambdaK = 5000.0

  /** One day's 6-dp-quantized PH term in micros — the same
    * round-HALF_UP grid as the batch op's DECIMAL(28,6) cumsum.
    */
  def term6(t: Long, y: Long, cum: Long): Long =
    BigDecimal((t.toDouble * y - cum) / t - DeltaK)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()

  class PageHinkleyProcessor extends StatefulProcessor[Long, DailyIn, PhOut] {
    @transient private var state: ValueState[PhState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[PhState]("ph",
        Encoders.product[PhState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[DailyIn],
        timerValues: TimerValues): Iterator[PhOut] = {
      var s = if (state.exists()) state.get() else PhState(0L, 0L, 0L, 0L)
      val out = Vector.newBuilder[PhOut]
      rows.toArray.sortBy(_.d).foreach { r =>
        val t = s.t + 1
        val cum = s.cum + r.y
        val m6 = s.m6 + term6(t, r.y, cum)
        val mmin6 = math.min(s.mmin6, m6)
        s = PhState(t, cum, m6, mmin6)
        val ph = (m6 - mmin6) / 1e6
        out += PhOut(key, r.d, r.y, ph, if (ph > LambdaK) 1 else 0)
      }
      state.update(s)
      out.result().iterator
    }
  }

  /** The streaming query: JSONL daily rollups → per-series PH rows.
    *
    * Precondition: `transformWithState` requires the RocksDB state
    * store provider AT QUERY START. This builder does NOT mutate the
    * session conf (ADVICE r13: a global set here silently switched the
    * provider for every other streaming query in the session and
    * outlived this one) — wrap the `.start()` call in
    * [[withRocksDbProvider]] instead.
    */
  def pageHinkleyStream(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(dailySchema).json(inputDir).as[DailyIn]
      .groupByKey(_.series_id)
      .transformWithState(new PageHinkleyProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Scope the RocksDB state-store provider to one query start: the
    * provider class is captured when the query starts, so setting it
    * around `.start()` and restoring the previous value immediately
    * after leaves every other (and every future) streaming query on
    * the session's own provider.
    */
  def withRocksDbProvider[T](spark: SparkSession)(startQuery: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try startQuery
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
