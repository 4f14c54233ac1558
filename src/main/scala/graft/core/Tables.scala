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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read it as a raw nanos long (legacy conf) —
    * long arithmetic is also the cheaper representation for window
    * ordering and sessionization. `ts_us` = epoch micros (floor), the
    * same truncation DuckDB applies reading nanos into its µs
    * timestamps, so derived values stay comparable.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
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
