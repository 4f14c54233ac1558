package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 streaming pin: the fixed-bound histogram sink merges
  * losslessly and bounds quantile error by one bucket width. */
class Round13uSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("HistogramSink: cross-batch merge equals one batch histogram;" +
    " estimates within a bucket width of exact") {
    import graft.streaming.HistogramSink
    val vals = graft.core.Tables(spark, sf).orders
      .selectExpr("o_orderpriority AS k",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("v")))
    val in = java.nio.file.Files.createTempDirectory("hist_in").toString
    val st = java.nio.file.Files.createTempDirectory("hist_state").toString
    val q = HistogramSink.start(spark, in, st)
    try {
      val (h1, h2) = vals.splitAt(vals.length / 2)
      Seq(h1 -> "b0", h2 -> "b1").foreach { case (half, name) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$in/$name.jsonl"),
          half.map { case (k, v) => s"""{"k":"$k","v":$v}""" }.mkString("\n"))
        q.processAllAvailable()
      }
      // lossless merge: state == one histogram over everything
      import spark.implicits._
      val all = vals.toSeq.toDF("k", "v")
      val want = HistogramSink.histogram(all).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val got = HistogramSink.currentHistogram(spark, st).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, "merged state must equal the one-shot histogram")
      // estimates: within one bucket width of the exact ceil-rank value
      for (qq <- Seq(50, 95, 99)) {
        val rows = HistogramSink.currentEstimate(spark, st, qq).collect()
        val est = rows.map(r => r.getAs[String]("k") -> r.getAs[Long]("est_value")).toMap
        // saturation alarm column (ADVICE r13): o_totalprice*100 is in
        // domain, so clamped_count must equal the true end-bucket mass
        val clamped = rows.map(r => r.getAs[String]("k") -> r.getAs[Long]("clamped_count")).toMap
        vals.groupBy(_._1).foreach { case (k, rows) =>
          val sorted = rows.map(_._2).sorted
          val exact = sorted((qq * sorted.length + 99) / 100 - 1)
          assert(math.abs(est(k) - exact) <= HistogramSink.Width,
            s"$k p$qq: est ${est(k)} vs exact $exact beyond one bucket width")
          val endMass = rows.map(_._2).count { v =>
            val b = math.min(math.max((v - HistogramSink.Lo) / HistogramSink.Width, 0L),
              HistogramSink.Buckets - 1L)
            b == 0L || b == HistogramSink.Buckets - 1L
          }
          assert(clamped(k) == endMass.toLong,
            s"$k: clamped_count ${clamped(k)} != end-bucket mass $endMass")
        }
      }
    } finally q.stop()
  }
}
