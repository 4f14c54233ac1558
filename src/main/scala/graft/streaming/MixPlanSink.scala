package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming corpus-mix monitor (SURVEY.md §2 K, round 14): the
  * streaming face of `TextAnalysis.corpusMixPlan` — a `foreachBatch`
  * sink that maintains per-source (n_docs, tokens) counters across
  * micro-batches, so an ingest pipeline watches its mix drift LIVE
  * instead of re-scanning the corpus. The merge is a lossless integer
  * sum: state after any number of micro-batches is row-identical to
  * one batch aggregate over the concatenated input (spec-pinned), and
  * `currentPlan` derives the mixing table (natural vs uniform-target
  * share, repeat factor, epoch ceiling) from state through the SAME
  * shared projection the batch operator uses
  * ([[graft.operators.TextAnalysis.mixPlanFrom]]) — the two faces
  * cannot drift apart. State is ≤ |sources| rows forever; snapshot
  * versioning follows [[UpsertSink]] (rotation, object-store safe).
  *
  * Scale shape: each micro-batch pays one map-side token-count
  * partial aggregate over its own rows plus a |sources|-row merge —
  * the monitor's cost is O(batch), never O(corpus).
  */
object MixPlanSink {

  /** Schema of a streamed document file (JSONL). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private val stateSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("n_docs", LongType),
    StructField("tokens", LongType)))

  /** Per-source doc/token counters of one frame — the ONE counting
    * derivation both the sink and the batch-parity check use
    * (whitespace tokens, the textTokenCount convention).
    */
  def perSource(df: DataFrame): DataFrame =
    df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " +"), t => length(t) > 0)).cast("long"))
          .as("tokens"))

  /** Current counters (empty, schema'd, before the first batch).
    * Reads the latest COMMITTED (marker-bearing) snapshot: a
    * marker-less version is foreign/uncommitted debris and must not
    * serve as merge base (see [[VersionedState.latestCommitted]]).
    */
  def currentState(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readCommittedOrEmpty(spark, stateDir, stateSchema)

  /** The live mixing table — the batch operator's exact projection
    * over the maintained counters.
    */
  def currentPlan(spark: SparkSession, stateDir: String): DataFrame =
    graft.operators.TextAnalysis.mixPlanFrom(currentState(spark, stateDir))

  /** Apply one micro-batch to the counters — REPLAY-IDEMPOTENT: the
    * sum merge is not naturally idempotent (unlike the OR/MAX sinks),
    * so a batch at-or-below the recorded applied id is skipped —
    * foreachBatch re-delivers the last batch on failure recovery and
    * a second sum would double-count every source it touched.
    * Factored out of the stream closure so the replay contract is
    * directly testable.
    */
  private[graft] def applyBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val sp = batch.sparkSession
    if (batchId > VersionedState.lastAppliedBatch(stateDir)) {
      val merged = currentState(sp, stateDir)
        .unionByName(perSource(batch))
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("tokens")).as("tokens"))
      VersionedState.commit(merged, stateDir, batchId)
    }
  }

  /** Start the counter-maintenance stream over JSONL documents.
    *
    * `checkpointDir` defaults to a STABLE location under the state
    * dir (ADVICE r14): without it every invocation got a fresh temp
    * checkpoint whose batch ids restart at 0, and the
    * `batchId > lastAppliedBatch` replay guard would then silently
    * SKIP every new batch after a restart. A stable checkpoint keeps
    * ids monotonic across restarts — the contract the applied-batch
    * marker assumes.
    */
  def start(spark: SparkSession, inputDir: String, stateDir: String,
      checkpointDir: Option[String] = None): StreamingQuery =
    spark.readStream.schema(docSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$stateDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, stateDir, bid)
      }
      .start()
}
