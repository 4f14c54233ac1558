package graft

import graft.sources.GraftSources
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sample end-to-end pipeline through the public API — the reference's
  * ingest→store→load flow (JSONL event dump → date-partitioned
  * parquet → incremental warehouse load → streaming sessionization)
  * in one runnable demo. Doubles as the verification surface for the
  * sources/streaming modules.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.create("graft-demo", "local[4]", 4)
    spark.sparkContext.setLogLevel("WARN")
    // prove the session extensions exposed the custom functions to SQL
    println("DEMO graft_dot via SQL = " + spark
      .sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))").collect()(0).getDouble(0))

    val work = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val minUs = 60L * 1000000

    // 1. land a raw JSONL event dump (stage-5 analog)
    def ev(id: Long, tsUs: Long, user: Long, typ: String, v: Double, date: String) =
      s"""{"event_id":$id,"ts_us":$tsUs,"user_id":$user,"event_type":"$typ","value":$v,"event_date":"$date"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/day1.jsonl"),
      Seq(ev(1, 1 * minUs, 7, "click", 1.5, "2024-01-01"),
        ev(2, 3 * minUs, 7, "click", 2.5, "2024-01-01"),
        ev(3, 2 * minUs, 8, "view", 9.0, "2024-01-01")).mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(
      EventStream.eventSchema.fields :+
        org.apache.spark.sql.types.StructField("event_date",
          org.apache.spark.sql.types.StringType))
    val day1 = GraftSources.jsonl(spark, s"$work/day1.jsonl", schema)
    println(s"DEMO ingested day1 rows=${day1.count()}")

    // 2. date-partitioned parquet sink (stage-6 analog)
    val table = s"$work/events_table"
    GraftSources.writePartitioned(day1, table, Seq("event_date"))
    println(s"DEMO partitions=${GraftSources.listPartitions(spark, table)}")

    // 3. incremental load: first load sees day1; re-load sees nothing;
    //    a day2 drop is picked up alone
    val state = s"$work/_loaded.txt"
    val (l1, n1) = GraftSources.incrementalLoad(spark, table, state)
    println(s"DEMO load1 new=$n1 rows=${l1.map(_.count()).getOrElse(0L)}")
    val (l2, n2) = GraftSources.incrementalLoad(spark, table, state)
    println(s"DEMO load2 new=$n2 loaded=${l2.isDefined}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$work/day2.jsonl"),
      ev(4, 50 * minUs, 7, "purchase", 30.0, "2024-01-02"))
    GraftSources.writePartitioned(
      GraftSources.jsonl(spark, s"$work/day2.jsonl", schema), table, Seq("event_date"))
    val (l3, n3) = GraftSources.incrementalLoad(spark, table, state)
    println(s"DEMO load3 new=$n3 rows=${l3.map(_.count()).getOrElse(0L)}")

    // 4. streaming over the same landing dir: windowed counts
    val streamIn = s"$work/stream_in"
    new java.io.File(streamIn).mkdirs()
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$work/day1.jsonl"),
      java.nio.file.Paths.get(s"$streamIn/b1.jsonl"))
    val wq = EventStream.windowedCounts(spark, streamIn).writeStream
      .outputMode("complete").format("memory").queryName("demo_wc").start()
    wq.processAllAvailable()
    println("DEMO windowed:")
    spark.table("demo_wc").orderBy("win_start", "event_type").collect()
      .foreach(r => println(s"DEMO   $r"))

    // 5. second micro-batch arrives → user 7's first session closes
    val sq = EventStream.sessionizeStream(spark, streamIn).writeStream
      .outputMode("append").format("memory").queryName("demo_sess").start()
    sq.processAllAvailable()
    println(s"DEMO sessions after batch1=${spark.table("demo_sess").count()}")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$work/day2.jsonl"),
      java.nio.file.Paths.get(s"$streamIn/b2.jsonl"))
    sq.processAllAvailable()
    println("DEMO sessions after batch2:")
    spark.table("demo_sess").orderBy("user_id", "session_start_us").collect()
      .foreach(r => println(s"DEMO   $r"))
    wq.stop(); sq.stop()
    spark.stop()
  }
}
