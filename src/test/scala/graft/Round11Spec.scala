package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-11 pins: the events `ts` physical-layout drift that zeroed
  * round 10 (the driver regenerated testdata from parquet
  * TIMESTAMP(NANOS) to plain `timestamp[us]`) must never zero a round
  * again. `Tables.events` branches on the read schema; these tests pin
  * that every layout the driver has ever shipped — and the NTZ/LTZ
  * variants Spark can produce — yields the exact same `ts_us`.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(df: DataFrame): String = {
    val tmp = Files.createTempDirectory("graft_tsdrift").toString
    df.write.parquet(s"$tmp/events.parquet")
    tmp
  }

  // canonical fixture in epoch micros, incl. a sub-ms tail that would
  // expose any ms-precision round-trip
  private val baseUs = Seq(
    (1L, 1700000000123456L),
    (2L, 1700000001999999L),
    (3L, 954430200000001L))

  test("Tables.events yields identical ts_us on nanos-long, timestamp and timestamp_ntz layouts") {
    val df = baseUs.toDF("event_id", "ts_us")
    val layouts = Seq(
      "nanos-long" -> df.select($"event_id", ($"ts_us" * 1000L).as("ts")),
      "timestamp_ltz" -> df.select($"event_id", timestamp_micros($"ts_us").as("ts")),
      "timestamp_ntz" -> df.select($"event_id",
        timestamp_micros($"ts_us").cast("timestamp_ntz").as("ts")))
    for ((label, layout) <- layouts) {
      val dir = writeEvents(layout)
      val got = graft.core.Tables(spark, dir).events
        .select("event_id", "ts_us").as[(Long, Long)].collect().toSet
      assert(got == baseUs.toSet, s"layout $label (${layout.schema("ts").dataType})")
    }
  }

  /** Mirror sf0.001 with `events.ts` re-encoded in a given physical
    * layout; every other table is symlinked, so the clone is cheap. */
  private def cloneSfWithEvents(events: DataFrame): String = {
    val tmp = Files.createTempDirectory("graft_sfclone").toString
    for (f <- new java.io.File(TestSpark.sf).listFiles()
         if f.getName != "events.parquet")
      Files.createSymbolicLink(Paths.get(s"$tmp/${f.getName}"), f.toPath)
    events.write.parquet(s"$tmp/events.parquet")
    tmp
  }

  test("entry path (factSales) runs on BOTH ts layouts of sf0.001 with equal counts") {
    val ev = graft.core.Tables(spark, TestSpark.sf).events
    val raw = ev.columns.filter(c => c != "ts_us" && c != "ts").map(col)
    val micros = ev.select(raw :+ timestamp_micros($"ts_us").as("ts"): _*)
    val nanosLong = ev.select(raw :+ ($"ts_us" * 1000L).as("ts"): _*)
    val a = graft.etl.StarSchema.factSales(spark, cloneSfWithEvents(micros)).count()
    val b = graft.etl.StarSchema.factSales(spark, cloneSfWithEvents(nanosLong)).count()
    assert(a > 0, "factSales must be non-empty on sf0.001 (driver smoke gate)")
    assert(a == b, s"layout-dependent factSales counts: micros=$a nanosLong=$b")
  }
}
