package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke for the driver's entry() contract: builds a DEFAULT
  * session (no graft-specific confs — same as the driver's smoke
  * harness) and checks entry() returns rows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(3, truncate = false)
    spark.stop()
  }
}
