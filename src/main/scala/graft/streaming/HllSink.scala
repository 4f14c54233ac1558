package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distinct-count dashboard (SURVEY.md §2 K): a
  * `foreachBatch` sink that maintains per-event-type HyperLogLog
  * REGISTERS across micro-batches — the streaming face of
  * `hll_rollup`'s mergeability argument. Exact streaming distinct
  * would need every seen key in state (unbounded); the register table
  * is ≤ types × 64 rows FOREVER, and merging a batch is one
  * union + max-per-bucket over that tiny table.
  *
  * Because the register merge is lossless (max is idempotent and
  * associative), the estimate after any number of batches is
  * BIT-IDENTICAL to the batch sketch over the concatenated input —
  * unit-tested. State versioning follows [[UpsertSink]] (snapshot
  * rotation, object-store safe).
  */
object HllSink {

  /** Per-(event_type, bucket) max-rho registers of one batch — the
    * same derivation as `approx_distinct_hll` (Sketches.scala), on an
    * arbitrary (event_type, user_id) frame.
    */
  private[graft] def registers(batch: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val suffix = col("h").bitwiseAND(lit(Sketches.SuffixMask.toLong))
    batch.select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", h)
      .select(col("event_type"),
        shiftright(col("h"), Sketches.SuffixBits).as("bucket"),
        when(suffix === 0, Sketches.SuffixBits + 1)
          .otherwise(lit(Sketches.SuffixBits + 1) - length(bin(suffix))).as("rho"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("m"))
  }

  private def latestVersion(stateDir: String): Option[(String, Int)] = {
    val root = new java.io.File(stateDir)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toInt).toOption.map(f.getPath -> _))
    if (versions.isEmpty) None else Some(versions.maxBy(_._2))
  }

  /** Current register table (empty, schema'd, before the first batch). */
  def currentRegisters(spark: SparkSession, stateDir: String): DataFrame =
    latestVersion(stateDir) match {
      case Some((path, _)) => spark.read.parquet(path)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("m",
              org.apache.spark.sql.types.IntegerType))))
    }

  /** Alpha-corrected estimate per event_type from the current state. */
  def currentEstimate(spark: SparkSession, stateDir: String): DataFrame =
    currentRegisters(spark, stateDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nb"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("zsum"))
      .withColumn("hll_estimate", expr(Sketches.EstimateExpr))
      .select(col("event_type"), col("hll_estimate"))
      .orderBy("event_type")

  /** Start the register-maintenance stream over JSONL events. */
  def start(spark: SparkSession, inputDir: String, stateDir: String): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    spark.readStream.schema(EventStream.eventSchema).json(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = registers(batch)
          .unionByName(currentRegisters(batch.sparkSession, stateDir))
          .groupBy(col("event_type"), col("bucket"))
          .agg(max(col("m")).as("m"))
        val nextV = latestVersion(stateDir).map(_._2 + 1).getOrElse(0)
        merged.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v$nextV")
        Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("v"))
          .filter(f => scala.util.Try(f.getName.drop(1).toInt).toOption
            .exists(_ < nextV - 1))
          .foreach(dir => org.apache.commons.io.FileUtils.deleteDirectory(dir))
        ()
      }
      .start()
  }
}
