package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** Streaming VECTOR-corpus ingest with near-dup admission (round 15)
  * — the streaming face of the batch `dedup_embedding_incremental`
  * operator: a `foreachBatch` sink that screens each arriving vector
  * micro-batch against the corpus state via multi-probe quantizer
  * cells + exact micro-unit cosine, and appends only the ADMITTED
  * vectors — the vector-store ingest contract (Milvus/FAISS-style:
  * quantizer trained offline and shipped; per-vector cell assignment
  * and probe list computed once at its own ingest and persisted).
  *
  * State per vector: (vec_id, qv, nrm, cell, probes) — the persisted
  * probe lists are what make the screen SYMMETRIC in O(batch·cell):
  * a spanning candidate is (new probes old's home) OR (old probes
  * new's home); both directions are equi-joins on cell against
  * batch-sized sides, never corpus².
  *
  * Replay-idempotent BY CONSTRUCTION (the UpsertSink family, no
  * applied-batch marker needed): the merge is an id-keyed insert
  * (old wins), so a replayed batch re-screens against unchanged state,
  * reaches identical verdicts, and inserts rows that dedupe away.
  * Snapshot versioning follows [[UpsertSink]] (rotation, object-store
  * safe).
  */
object VectorIngestSink {

  /** Cosine threshold for "near-dup" — BOUND to the batch family's τ
    * (a literal copy here could silently drift the two faces apart).
    */
  val Tau: Double = graft.operators.Ann.DupThreshold
  /** Probe width — bound to the batch family's nprobe. */
  val NProbe: Int = graft.operators.Ann.KnnProbe

  /** Schema of a streamed vector file (JSONL). */
  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  private val stateSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("qv", ArrayType(DoubleType, containsNull = false)),
    StructField("nrm", DoubleType),
    StructField("cell", LongType),
    StructField("probes", ArrayType(LongType, containsNull = false))))

  /** Install the trained coarse quantizer (cl, cv) into the state dir
    * — the offline-training artifact (e.g. the final Lloyd's centroids
    * of `embedding_kmeans`) the ingest job probes forever after.
    */
  def installQuantizer(centroids: DataFrame, stateDir: String): Unit =
    centroids.select(col("cl").cast("long").as("cl"), col("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/_quantizer")

  private def quantizer(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/_quantizer")

  /** Current admitted-corpus state (empty before the first batch). */
  def currentCorpus(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.readOrEmpty(spark, stateDir, stateSchema)

  /** Quantize + cell-assign + probe one frame of raw vectors against
    * the installed quantizer — the ONE derivation both ingest and any
    * batch-parity check use. Exact-integer distances (micro-unit
    * grid), rank ties broken by cell id; rank 1 = home cell.
    */
  def assignProbes(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    graft.functions.DotProduct.register(spark)
    // probe width follows the INSTALLED quantizer's size through the
    // same corpus-scaled knob as the batch family (round 16): a fixed
    // width on a k-cell quantizer would silently drift the streaming
    // screen's recall from the batch screen's as k grows; at the
    // test/oracle geometry (k = 8) this is exactly NProbe = 3
    val np = graft.operators.Ann.nprobeFor(cents.count().toInt)
    val q6 = transform(col("embedding"),
      v => floor(v.cast("double") * lit(1e6)).cast("double"))
    val centsRow = cents
      .groupBy()
      .agg(collect_list(struct(col("cl"), col("cv"))).as("cs"))
    vectors
      .select(col("vec_id"), q6.as("qv"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
      .join(broadcast(centsRow))
      .withColumn("ranked", expr(
        """array_sort(transform(cs, s -> struct(
          |  graft_dot(qv, qv) - CAST(2 AS DOUBLE) * graft_dot(qv, s.cv)
          |    + graft_dot(s.cv, s.cv) AS d2,
          |  s.cl AS cl)))""".stripMargin))
      .select(col("vec_id"), col("qv"), col("nrm"),
        expr("element_at(ranked, 1).cl").as("cell"),
        expr(s"transform(slice(ranked, 1, $np), s -> s.cl)").as("probes"))
  }

  /** Screen one raw-vector frame against the current corpus state:
    * every vector with its corpus-duplicate count and admit verdict —
    * the sink's per-batch decision table, exposed for tests and
    * dashboards.
    */
  def screen(batch: DataFrame, stateDir: String): DataFrame = {
    val spark = batch.sparkSession
    val corpus = currentCorpus(spark, stateDir)
    val b = assignProbes(batch, quantizer(spark, stateDir))
    // batch-probes × corpus-home and corpus-probes × batch-home: both
    // joins are batch-side-bounded equi-joins on cell
    val d1 = b.select(col("vec_id").as("nid"), explode(col("probes")).as("cell"))
      .join(corpus.select(col("vec_id").as("oid"), col("cell")), Seq("cell"))
      .select(col("nid"), col("oid"))
    val d2 = corpus.select(col("vec_id").as("oid"), explode(col("probes")).as("cell"))
      .join(b.select(col("vec_id").as("nid"), col("cell")), Seq("cell"))
      .select(col("nid"), col("oid"))
    val cand = d1.unionByName(d2).distinct()
    val dups = cand
      .join(b.select(col("vec_id").as("nid"), col("qv").as("qa"), col("nrm").as("na")), "nid")
      .join(corpus.select(col("vec_id").as("oid"), col("qv").as("qb"), col("nrm").as("nb")), "oid")
      .filter(col("na") * col("nb") > 0)
      .filter(call_function("graft_dot", col("qa"), col("qb")) /
        (col("na") * col("nb")) >= Tau)
      .groupBy(col("nid"))
      .agg(count(lit(1)).as("n_corpus_dups"))
    b.select(col("vec_id"), col("qv"), col("nrm"), col("cell"), col("probes"))
      .join(dups.withColumnRenamed("nid", "vec_id"), Seq("vec_id"), "left")
      .withColumn("n_corpus_dups", coalesce(col("n_corpus_dups"), lit(0L)))
      .withColumn("admitted", col("n_corpus_dups") === 0)
  }

  /** Apply one micro-batch: screen, append admitted vectors. The
    * id-keyed insert (old wins) makes replays no-ops — no applied-
    * batch marker needed (contrast the sum-merge sinks).
    */
  private[graft] def applyBatch(batch: DataFrame, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val corpus = currentCorpus(spark, stateDir)
    // intra-batch dedup FIRST: an at-least-once source can re-deliver
    // an id inside one trigger — without this, both copies pass the
    // anti-join below and the id-keyed-insert invariant (at most one
    // state row per vec_id) breaks permanently. Deterministic winner:
    // the lexicographically-smallest quantized vector (a content key,
    // so identical re-deliveries are a no-op and conflicting ones
    // resolve the same way on every replay).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(expr("concat_ws(',', transform(qv, v -> CAST(v AS STRING)))"))
    val admitted = screen(batch, stateDir)
      .filter(col("admitted"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cell"), col("probes"))
      // a replayed (or re-sent) id never displaces existing state
      .join(corpus.select(col("vec_id")), Seq("vec_id"), "left_anti")
    VersionedState.commit(corpus.unionByName(admitted), stateDir)
  }

  /** Start the ingest stream over JSONL vectors. Stable checkpoint
    * under the state dir (the MixPlanSink/HistogramSink convention).
    */
  def start(spark: SparkSession, inputDir: String, stateDir: String,
      checkpointDir: Option[String] = None): StreamingQuery =
    spark.readStream.schema(vectorSchema).json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$stateDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, stateDir)
      }
      .start()
}
