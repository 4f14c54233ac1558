package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers over the driver testdata layout
  * (`<dir>/<table>.parquet`).
  *
  * Plays the role of the reference's raw-source catalog — the MongoDB
  * `summary` event dump, `ip_locations`, and `product_details`
  * collections declared in the reference's dbt `_sources.yml`
  * (reference: `7.data-transformation-visualization/dbt-project-glamira/
  * models/_sources.yml`) — re-expressed as parquet readers so Catalyst
  * gets column pruning + predicate pushdown for free.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = Tables.read(spark, dir, name)

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 only reads as
    * a raw nanos long under the legacy conf) and plain `timestamp[us]`
    * (read as TIMESTAMP_NTZ). Branch on the READ schema so either
    * layout yields the same `ts_us` = epoch micros (floor):
    *  - LongType (nanos-as-long)  → floored ns→µs division (plain
    *    `div` truncates toward zero, which differs from DuckDB's
    *    epoch_us FLOOR for pre-1970 nanos: −1500 ns must be −2 µs,
    *    not −1 — hence the pmod-corrected form)
    *  - Timestamp / TimestampNTZ  → `unix_micros(cast(ts as timestamp_ltz))`
    * The session TZ is UTC everywhere (GraftSession/Verify/Bench), so
    * NTZ→LTZ is an identity re-tag, and the µs floor matches DuckDB's
    * `epoch_us(ts)` on both layouts — derived values stay comparable.
    * Long arithmetic downstream is also the cheaper representation for
    * window ordering and sessionization.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType => expr("(ts - pmod(ts, 1000)) div 1000")
      case TimestampType | TimestampNTZType =>
        expr("unix_micros(cast(ts as timestamp_ltz))")
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other (expected nanos-long or timestamp)")
    }
    raw.withColumn("ts_us", tsUs)
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  // ---- memoized base readers (optimization round 18, guide §6) ----
  // Every query invocation used to pay a fresh `spark.read.parquet`
  // per table it touches: a driver-side file listing plus a footer
  // schema read (~10-40 ms each) repeated for every run of all ~475
  // registry queries. The reader DataFrame is an immutable plan over
  // an immutable testdata path, so it is memoized per
  // (table, dir, session) — exactly the relation cache a catalog
  // table (`saveAsTable` + `spark.table`) would give, with NO data or
  // result caching (every action still scans parquet). Eviction rides
  // SharedFrames' lifecycle hooks: `reset()` (isolated-bench mode —
  // each query must re-pay its own reader construction) clears all,
  // `releaseSession` drops a discarded session's entries. The session
  // check mirrors SharedFrames: an identityHashCode collision between
  // two LIVE sessions must rebuild rather than hand a frame to the
  // wrong session.
  @volatile private var hooked = false
  private val frames = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      SharedFrames.onEvict {
        case None => frames.clear()
        case Some(s) =>
          val it = frames.entrySet().iterator()
          while (it.hasNext) if (it.next().getValue.sparkSession eq s) it.remove()
      }
      hooked = true
    }
  }

  private[core] def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureHook()
    val k = s"$name@$dir@${System.identityHashCode(spark)}"
    val e = frames.get(k)
    if (e != null && (e.sparkSession eq spark)) e
    else {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // perf memo only: bound growth across many short-lived test
      // sessions by dropping everything rather than tracking LRU
      if (frames.size > 512) frames.clear()
      frames.put(k, df)
      df
    }
  }

  /** Exact row count of a base table from parquet FOOTER metadata —
    * the zero-job replacement for build-time `df.count()` layout
    * decisions (broadcast-vs-shuffle caps). Reads the footers on the
    * driver (~ms), never schedules a job, and is exact by the parquet
    * spec (file metadata carries num_rows per row group). Handles both
    * single-file layouts (`<dir>/<name>.parquet` the testdata uses)
    * and directory layouts (part files from a Spark write).
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def leafFiles(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(leafFiles)
      else if (st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")) Nil
      else Seq(st)
    leafFiles(fs.getFileStatus(root)).map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }
}
