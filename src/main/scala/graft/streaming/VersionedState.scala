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
}
