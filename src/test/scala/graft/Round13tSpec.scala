package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 streaming pin: the Page-Hinkley drift monitor matches the
  * batch operator's arithmetic byte-for-byte across micro-batches. */
class Round13tSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming Page-Hinkley equals the sequential replay and the batch summary") {
    import graft.streaming.DriftMonitor
    val days = graft.core.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(expr("CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000) AS BIGINT)").as("y"))
      .orderBy("d").collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString, r.getAs[Long]("y")))
    val dir = java.nio.file.Files.createTempDirectory("ph_stream").toString
    val q = DriftMonitor.withRocksDbProvider(spark) {
      DriftMonitor.pageHinkleyStream(spark, dir).writeStream
        .outputMode("update").format("memory").queryName("ph_stream").start()
    }
    // the provider scoping must not leak past start (ADVICE r13)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
    try {
      // two chronological micro-batches — state must carry across
      val (h1, h2) = days.splitAt(days.length / 2)
      Seq(h1 -> "b0", h2 -> "b1").foreach { case (half, name) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.jsonl"),
          half.map { case (d, y) =>
            s"""{"series_id":1,"d":"$d","y":$y}"""
          }.mkString("\n"))
        q.processAllAvailable()
      }
      val got = spark.table("ph_stream").collect()
        .map(r => r.getAs[String]("d") ->
          ((r.getAs[Double]("ph"), r.getAs[Int]("alarm")))).toMap
      assert(got.size == days.length, "one PH row per day")
      // sequential replay with the same micros arithmetic
      var t = 0L; var cum = 0L; var m6 = 0L; var mmin6 = 0L
      var alarms = 0L; var maxPh = 0.0
      days.foreach { case (d, y) =>
        t += 1; cum += y
        m6 += DriftMonitor.term6(t, y, cum)
        mmin6 = math.min(mmin6, m6)
        val ph = (m6 - mmin6) / 1e6
        if (ph > maxPh) maxPh = ph
        val alarm = if (ph > DriftMonitor.LambdaK) 1 else 0
        alarms += alarm
        assert(got(d) == ((ph, alarm)), s"$d: got ${got(d)}, replay ($ph, $alarm)")
      }
      // and the batch operator's summary agrees on the same data
      val batch = SparkEntry.queries("page_hinkley_drift")(spark, sf).collect().head
      assert(batch.getAs[Long]("n_alarm_days") == alarms)
      assert(math.abs(batch.getAs[Double]("max_ph") - maxPh) < 1e-9 * (1.0 + maxPh))
    } finally q.stop()
  }
}
