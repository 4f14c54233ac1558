package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults: AQE on (runtime
  * shuffle-partition coalescing + skew-join splitting), UTC, and the
  * graft custom expressions registered. At cluster scale the same
  * settings apply — only `master` and the shuffle-partition count
  * (sized ~2-3× total cores) change.
  */
object GraftSession {
  def create(appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    register(spark)
    spark
  }

  /** Register graft's custom Catalyst expressions in an existing
    * session (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    graft.functions.DotProduct.register(spark)
    graft.functions.TokenShingles.register(spark)
  }
}
