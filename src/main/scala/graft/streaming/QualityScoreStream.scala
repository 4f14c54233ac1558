package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming serving face of the TRAINED quality filter (SURVEY.md
  * §2 K): train the logistic model ONCE on the batch corpus
  * ([[graft.operators.TextAnalysis.qualityLogregFilter]]'s machinery),
  * install its 4-double weight vector as an artifact, then score every
  * streamed document micro-batch with the SAME signal, feature, and
  * logit expressions — the train-batch / serve-stream contract every
  * production quality filter runs (a fasttext-style model retrained
  * nightly, applied to the live ingest firehose).
  *
  * Guarantee (pinned in Round16cSpec): a document scored by the stream
  * carries the bit-identical logit the batch query assigns it, because
  * the serving path IS the training path's projection — one
  * `lrFeaturesOf` + `scoreQuality`, never a reimplementation. The
  * installed weights are 4 doubles (a model artifact, not data — the
  * VectorIngestSink installed-quantizer pattern).
  *
  * Scale shape per batch: signals and features are map-side
  * expressions over the incoming micro-batch (the TokenShingles /
  * normTokens codegen'd path); the weight frame is a broadcast 1-row
  * crossJoin. No state store, no shuffle — the scorer is stateless,
  * so throughput is scan-bound.
  */
object QualityScoreStream {

  /** Schema of a streamed document (JSONL). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Train on the batch corpus at `dir` and collect the installed
    * model: (w0, w1, w2, w3). Driver-side by design — this is the
    * artifact hand-off between the training job and the serving
    * stream, 4 doubles.
    */
  def trainAndInstall(spark: SparkSession, dir: String): Array[Double] = {
    val T = graft.operators.TextAnalysis
    val feat = T.lrFeaturesOf(T.qualityRuleSignals(spark, dir), withLabel = true)
    val r = T.trainQualityModel(feat).collect()(0)
    Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Schema of a score row. `logit` is nullable: a document that
    * normalizes to ZERO tokens has no defined features (every feature
    * divides by the token count), so it is emitted with a null logit
    * and `admit = false` — the teacher rule rejects it as too-short
    * anyway, and emitting it keeps the stream's coverage contract
    * (every streamed document appears in the output exactly once).
    */
  val scoreSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("logit", DoubleType),
    StructField("admit", BooleanType),
    StructField("batch_id", LongType)))

  /** Per-doc scores written so far: (doc_id, logit, admit). Read with
    * the explicit score schema — a bare parquet read would throw on an
    * outDir the stream has not committed any file to yet (ADVICE r16);
    * before the first micro-batch this returns an empty typed frame.
    */
  def scores(spark: SparkSession, outDir: String): DataFrame = {
    val df =
      if (new java.io.File(outDir).exists())
        spark.read.schema(scoreSchema).parquet(outDir)
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          scoreSchema)
    df.select(col("doc_id"), col("logit"), col("admit"))
  }

  /** Start the scoring stream: JSONL docs in `inputDir` are scored
    * with the installed `weights`; (doc_id, logit, admit) rows land
    * under `outDir`, one partition per micro-batch.
    *
    * Replay-idempotent (ADVICE r16): on failure recovery Structured
    * Streaming re-delivers the last uncommitted batch to foreachBatch,
    * so a plain append would duplicate its rows. Each batch writes to
    * its OWN `batch_id=<id>` partition with dynamic partition
    * overwrite — a replayed batch overwrites exactly the partition it
    * wrote before (same batch id ⇒ same input split ⇒ same rows), and
    * every other batch's partition is untouched. Same contract as the
    * VersionedState `lastAppliedBatch` guard, expressed in the layout.
    */
  def start(spark: SparkSession, weights: Array[Double], inputDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    require(weights.length == 4, "installed model is (w0, w1, w2, w3)")
    val T = graft.operators.TextAnalysis
    spark.readStream.schema(docSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        val w = sess.range(1).select(
          lit(weights(0)).as("w0"), lit(weights(1)).as("w1"),
          lit(weights(2)).as("w2"), lit(weights(3)).as("w3"))
        val sig = T.qualityRuleSignalsOf(batch)
        val feat = T.lrFeaturesOf(sig, withLabel = false)
        val scored = T.scoreQuality(feat, w)
          .select(col("doc_id"), col("logit"), col("admit"))
        // coverage: zero-token docs (dropped by the feature projection)
        // ride along with a null logit and admit = false
        sig.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"), col("logit"),
            coalesce(col("admit"), lit(false)).as("admit"),
            lit(batchId).as("batch_id"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .start()
  }
}
