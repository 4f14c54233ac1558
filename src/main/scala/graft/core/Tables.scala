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
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
}
