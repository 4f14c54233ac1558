package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpT {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"TIME $n ${(System.nanoTime()-t0)/1e9}%.2f rows=$c")
    }
    val dir = "/root/testdata/sf0.1"
    time("events_scan") { graft.core.Tables(spark, dir).events.count() }
    time("events_groupby") { graft.core.Tables(spark, dir).events
      .groupBy("user_id").agg(count(lit(1))).count() }
    time("scd2_1") { graft.etl.StarSchema.scd2History(spark, dir).count() }
    time("scd2_2") { graft.etl.StarSchema.scd2History(spark, dir).count() }
    spark.stop()
  }
}
