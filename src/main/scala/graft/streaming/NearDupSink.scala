package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming near-duplicate suppression (SURVEY.md §2 K): a
  * `foreachBatch` sink that simhash-screens each micro-batch of
  * documents against a persistent signature store — the streaming face
  * of the batch `dedup_simhash` + `dedup_keep_canonical` pair, and a
  * deliberate demonstration that the BATCH dedup machinery (the
  * one-pass SimHash64 expression and the Manku C(b,3) block cover in
  * `Dedup.simHashCandidates`) is directly reusable inside a stream.
  *
  * Rule: a document is suppressed iff some EARLIER-ARRIVED document
  * (any prior batch via the store, or a lower doc_id inside the same
  * batch) is within hamming ≤ 3 of its 63-bit simhash; `dup_of` is the
  * minimum such neighbor. Suppressed docs do NOT enter the store, so
  * the store stays one-signature-per-surviving-doc — bounded by the
  * deduped corpus, not the stream.
  *
  * State is versioned parquet snapshots (`v0, v1, …`), the
  * [[UpsertSink]] object-store-safe rotation. Scale shape per batch:
  * signatures are map-side expressions over the incoming batch; the
  * candidate join is the same sub-quadratic block cover as batch
  * dedup, sized by the UNION corpus (store + batch).
  */
object NearDupSink {

  /** Schema of a streamed document (JSONL). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts_us", LongType),
    StructField("text", StringType)))

  /** Surviving signatures (doc_id, simhash); empty before any batch. */
  def currentSignatures(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readOrEmpty(spark, stateDir,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("simhash", LongType))))

  /** Per-doc decisions written so far: (doc_id, is_dup, dup_of). */
  def decisions(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)

  /** Start the suppression stream: JSONL docs in `inputDir` screen
    * against `stateDir`; per-doc decisions append to `outDir`.
    */
  def start(spark: SparkSession, inputDir: String, stateDir: String,
      outDir: String): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    spark.readStream.schema(docSchema).json(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        graft.functions.TokenShingles.register(sess)
        graft.functions.SimHash64.register(sess)
        val incoming = batch.select(col("doc_id"),
          call_function("graft_simhash",
            call_function("graft_shingles", col("text"), lit(1))).as("simhash"))
          .cache()
        val known = currentSignatures(sess, stateDir)
        val all = known.unionByName(incoming)
        // corpus-sized block layout, exactly as batch dedup selects it
        val b = graft.operators.Dedup.simHashBlockCount(
          known.count() + incoming.count())
        val pairs = graft.operators.Dedup.simHashCandidates(all, b)
          .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
          .select(col("doc_a"), col("doc_b"))
        val edges = pairs.select(col("doc_a").as("d"), col("doc_b").as("nb"))
          .unionByName(pairs.select(col("doc_b").as("d"), col("doc_a").as("nb")))
        val knownIds = known.select(col("doc_id").as("nb"), lit(true).as("is_known"))
        // a neighbor counts iff it arrived earlier: any store doc, or a
        // lower-id doc of the same batch
        val dupOf = edges
          .join(incoming.select(col("doc_id").as("d")), "d")
          .join(knownIds, Seq("nb"), "left")
          .filter(col("is_known").isNotNull || col("nb") < col("d"))
          .groupBy(col("d"))
          .agg(min(col("nb")).as("dup_of"))
          .cache() // read twice (decisions + survivor anti-join); tiny
        val decided = incoming
          .join(dupOf, incoming("doc_id") === dupOf("d"), "left")
          .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
        decided.coalesce(1).write.mode("append").parquet(outDir)
        val survivors = incoming
          .join(dupOf, incoming("doc_id") === dupOf("d"), "left_anti")
        VersionedState.commit(known.unionByName(survivors), stateDir)
        dupOf.unpersist()
        incoming.unpersist()
        ()
      }
      .start()
  }
}
