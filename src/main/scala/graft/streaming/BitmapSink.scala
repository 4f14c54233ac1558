package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EXACT distinct counts (SURVEY.md §2 K): the bitmap
  * counterpart of [[HllSink]]. Where the HLL sink trades exactness
  * for 64-registers-per-group state, this one keeps per-(event_type,
  * word) `bit_or` masks — state is groups × ⌈keyspace/64⌉ rows (∝
  * occupied words when sparse), and the count after any number of
  * micro-batches is EXACT: bit_or is idempotent and associative, so
  * replayed users, cross-batch repeats, and any batch split produce
  * the identical mask table a single batch pass would (unit-tested
  * bit-identical against the batch `bitmap_distinct` over the
  * concatenated input). The right sink when the key space is dense
  * bounded integers and exactness is required; the HLL sink when keys
  * are unbounded. State versioning follows [[UpsertSink]] (snapshot
  * rotation, object-store safe).
  */
object BitmapSink {

  /** One batch's word masks — THE shared [[Sketches.bitmapWords]]
    * derivation, so the streaming face can never drift from the
    * oracled batch query.
    */
  private[graft] def words(batch: DataFrame): DataFrame =
    Sketches.bitmapWords(
      batch.select(col("event_type"), col("user_id")), Seq("event_type"))

  private val wordSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("w",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("mask",
      org.apache.spark.sql.types.LongType)))

  /** Current word-mask table (empty, schema'd, before the first batch). */
  def currentWords(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readOrEmpty(spark, stateDir, wordSchema)

  /** Exact distinct users per event_type — plus the exact re-merged
    * ALL row — from the current state (the streaming face of
    * `bitmap_distinct`'s output contract).
    */
  def currentCounts(spark: SparkSession, stateDir: String): DataFrame = {
    val words = currentWords(spark, stateDir)
    val perType = words.groupBy(col("event_type"))
      .agg(sum(bit_count(col("mask"))).as("n_users"))
    val all = words.groupBy(col("w")).agg(expr("bit_or(mask)").as("mask"))
      .agg(sum(bit_count(col("mask"))).as("n_users"))
      .select(lit("ALL").as("event_type"), col("n_users"))
    perType.unionByName(all).orderBy("event_type")
  }

  /** Start the mask-maintenance stream over JSONL events. */
  def start(spark: SparkSession, inputDir: String, stateDir: String): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    spark.readStream.schema(EventStream.eventSchema).json(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = words(batch)
          .unionByName(currentWords(batch.sparkSession, stateDir))
          .groupBy(col("event_type"), col("w"))
          .agg(expr("bit_or(mask)").as("mask"))
        VersionedState.commit(merged, stateDir)
        ()
      }
      .start()
  }
}
