package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming quantile dashboard (SURVEY.md §2 K): a `foreachBatch`
  * sink that maintains per-key FIXED-BOUND equi-width histograms
  * across micro-batches — the streaming face of
  * `quantile_sketch_audit`'s sketch-for-sort argument. Exact streaming
  * quantiles would hold every value in state (unbounded); the
  * histogram is ≤ keys × 256 rows FOREVER, and because the bucket
  * layout is FIXED (not data-dependent min/max — the production
  * configuration choice), merging a batch is a lossless
  * sum-per-bucket: the state after any number of micro-batches is
  * bucket-for-bucket identical to one batch histogram over the
  * concatenated input (unit-tested), and every ceil-rank midpoint
  * estimate is within one bucket width of the exact quantile.
  * State versioning follows [[UpsertSink]] (snapshot rotation,
  * object-store safe).
  */
object HistogramSink {

  /** Fixed value domain in exact integer units (covers TPC-H order
    * totals in cents with headroom); values past the edge clamp into
    * the end buckets — the standard configured-domain tradeoff,
    * observable as end-bucket mass.
    */
  val Lo = 0L
  val Hi = 64000000L
  val Buckets = 256
  val Width: Long = (Hi - Lo) / Buckets

  /** Schema of a streamed value file (JSONL): grouping key + exact
    * integer value (cents).
    */
  val valueSchema: StructType = StructType(Seq(
    StructField("k", StringType),
    StructField("v", LongType)))

  private val stateSchema = StructType(Seq(
    StructField("k", StringType),
    StructField("bucket", LongType),
    StructField("c", LongType)))

  /** Per-(key, bucket) counts of one frame — the ONE bucketing
    * derivation both the sink and the batch-parity check use.
    */
  def histogram(df: DataFrame): DataFrame =
    df.select(col("k"),
        expr(s"least(greatest((v - $Lo) div $Width, 0), ${Buckets - 1})").as("bucket"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Current histogram state (empty, schema'd, before the first
    * batch). Reads the latest COMMITTED (marker-bearing) snapshot: a
    * marker-less version is foreign/uncommitted debris and must not
    * serve as merge base (see [[VersionedState.latestCommitted]]).
    */
  def currentHistogram(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readCommittedOrEmpty(spark, stateDir, stateSchema)

  /** Ceil-rank bucket-midpoint estimates per key for quantile `q`
    * (percent) from the current state.
    *
    * `clamped_count` is the key's mass sitting in the two SATURATING
    * end buckets (values outside [Lo, Hi) clamp into bucket 0 /
    * Buckets-1): when it is non-zero the "within one bucket width"
    * error bound no longer holds for quantiles that land in clamped
    * mass — consumers must check it rather than trust the estimate
    * blindly (ADVICE r13). In-domain values that legitimately bucket
    * to the ends are counted too (the state cannot tell them apart);
    * the column is a conservative saturation alarm, not an exact
    * out-of-domain count.
    */
  def currentEstimate(spark: SparkSession, stateDir: String, q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    currentHistogram(spark, stateDir)
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("k").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("k")))
      .withColumn("clamped", sum(expr(
        s"CASE WHEN bucket = 0 OR bucket = ${Buckets - 1} THEN c ELSE 0 END"))
        .over(Window.partitionBy("k")))
      .filter(expr(s"cum >= ($q * n + 99) div 100"))
      .groupBy(col("k"))
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n"),
        max(col("clamped")).as("clamped"))
      .selectExpr("k", s"CAST($q AS INTEGER) AS q", "CAST(n AS BIGINT) AS n",
        s"$Lo + bucket * $Width + ${Width / 2} AS est_value",
        "CAST(clamped AS BIGINT) AS clamped_count")
      .orderBy("k")
  }

  /** Start the histogram-maintenance stream over JSONL values.
    *
    * `checkpointDir` defaults to a STABLE location under the state
    * dir (ADVICE r14): a fresh temp checkpoint per invocation restarts
    * batch ids at 0, and the replay guard would then silently skip
    * every new batch after a restart. Stable checkpoint → monotonic
    * ids — the applied-batch-marker contract.
    */
  def start(spark: SparkSession, inputDir: String, stateDir: String,
      checkpointDir: Option[String] = None): StreamingQuery =
    spark.readStream.schema(valueSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$stateDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, stateDir, bid)
      }
      .start()

  /** Apply one micro-batch — REPLAY-IDEMPOTENT (round 14): the
    * sum-per-bucket merge is not naturally idempotent (unlike the
    * OR/MAX/upsert sinks), so a batch at-or-below the recorded
    * applied id is skipped — foreachBatch re-delivers the last batch
    * on failure recovery and a second sum would double every bucket
    * it touched. Factored out so the replay contract is testable.
    */
  private[graft] def applyBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val sp = batch.sparkSession
    if (batchId > VersionedState.lastAppliedBatch(stateDir)) {
      val merged = currentHistogram(sp, stateDir)
        .unionByName(histogram(batch))
        .groupBy(col("k"), col("bucket"))
        .agg(sum(col("c")).as("c"))
      VersionedState.commit(merged, stateDir, batchId)
    }
  }
}
