package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned parquet snapshot state shared by the foreachBatch sinks
  * ([[UpsertSink]], [[NearDupSink]], [[HllSink]]): state lives as
  * `v0, v1, …` directories — each batch reads the latest, writes the
  * next, and prunes everything older than the previous snapshot
  * (kept for in-flight readers). Rename-free atomic replace that is
  * safe on object stores where overwriting a directory under
  * concurrent read is not.
  */
private[streaming] object VersionedState {

  /** Latest (path, version) snapshot, if any batch has committed. */
  def latestVersion(stateDir: String): Option[(String, Int)] = {
    val root = new java.io.File(stateDir)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toInt).toOption.map(f.getPath -> _))
    if (versions.isEmpty) None else Some(versions.maxBy(_._2))
  }

  /** Current state, or an empty frame with `schema` before batch 0. */
  def readOrEmpty(spark: SparkSession, stateDir: String, schema: StructType): DataFrame =
    latestVersion(stateDir) match {
      case Some((path, _)) => spark.read.parquet(path)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Write `next` as the successor snapshot and prune versions older
    * than the predecessor. Returns the new version number.
    */
  def commit(next: DataFrame, stateDir: String): Int = {
    val nextV = latestVersion(stateDir).map(_._2 + 1).getOrElse(0)
    next.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v$nextV")
    Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .filter(f => scala.util.Try(f.getName.drop(1).toInt).toOption
        .exists(_ < nextV - 1))
      .foreach(dir => org.apache.commons.io.FileUtils.deleteDirectory(dir))
    nextV
  }

  /** The micro-batch id recorded with the latest snapshot, −1 if none
    * (pre-batch-0 state, or a snapshot from a sink that doesn't track
    * ids). Lets NON-idempotent merges (sum-counters — HistogramSink,
    * MixPlanSink) skip a REPLAYED batch: foreachBatch re-runs the last
    * batch after a failure-recovery, and a second sum would
    * double-count where the OR/MAX/upsert sinks absorb it naturally.
    * Contract: ids are the query's checkpointed batch ids (monotonic
    * across restarts FROM the checkpoint); pointing a brand-new query
    * (fresh checkpoint, ids restarting at 0) at an old state dir is
    * a caller error.
    */
  def lastAppliedBatch(stateDir: String): Long =
    latestVersion(stateDir).map { case (path, _) =>
      val f = new java.io.File(path, "_applied_batch")
      if (!f.exists()) -1L
      else scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
        .getOrElse(-1L)
    }.getOrElse(-1L)

  /** [[commit]] plus the applied-batch marker (an `_`-prefixed file —
    * parquet readers ignore it, `_SUCCESS`-style). The marker lands
    * after the snapshot data: a crash in between leaves a snapshot
    * with no marker, which reads as "unknown" (−1) and the replayed
    * batch re-applies — the same at-least-once window the snapshot
    * write itself has, never a silent double-count of a MARKED batch.
    */
  def commit(next: DataFrame, stateDir: String, batchId: Long): Int = {
    val v = commit(next, stateDir)
    if (batchId >= 0)
      java.nio.file.Files.write(
        new java.io.File(s"$stateDir/v$v", "_applied_batch").toPath,
        batchId.toString.getBytes("UTF-8"))
    v
  }
}
