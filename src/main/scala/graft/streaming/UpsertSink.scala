package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming → warehouse upsert (SURVEY.md §2 K): a `foreachBatch`
  * sink that SCD1-merges each micro-batch into a parquet state table —
  * the standard pattern for keeping a serving dimension current off a
  * change stream when the table format has no native MERGE.
  *
  * State is kept as versioned snapshot directories (`v0, v1, …`): each
  * batch reads the latest version, merges, and writes the next —
  * a rename-free way to get atomic replace on object stores where
  * overwriting a directory that is concurrently read is unsafe. The
  * merge itself is the batch `Incremental.mergeUpsert` shape: per-key
  * newest record from the batch, full-outer against current state,
  * newest-ts-wins.
  */
object UpsertSink {

  /** Current merged state (empty schema'd frame before the first batch). */
  def currentState(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readOrEmpty(spark, stateDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType))))

  /** Start the upsert stream: JSONL events in `inputDir` merge into
    * `stateDir` (one row per user_id, newest value wins).
    */
  def start(spark: SparkSession, inputDir: String, stateDir: String): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    spark.readStream.schema(EventStream.eventSchema).json(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("value"), col("ts_us"))
        val cur = currentState(batch.sparkSession, stateDir)
        val next = cur.toDF("c_user", "c_value", "c_ts")
          .join(latest, col("c_user") === col("user_id"), "full_outer")
          .select(
            coalesce(col("user_id"), col("c_user")).as("user_id"),
            // newest-wins: the batch row replaces state only if newer
            when(col("user_id").isNull, col("c_value"))
              .when(col("c_user").isNull || col("ts_us") >= col("c_ts"), col("value"))
              .otherwise(col("c_value")).as("value"),
            greatest(coalesce(col("ts_us"), lit(Long.MinValue)),
              coalesce(col("c_ts"), lit(Long.MinValue))).as("ts_us"))
        VersionedState.commit(next, stateDir)
        ()
      }
      .start()
  }
}
