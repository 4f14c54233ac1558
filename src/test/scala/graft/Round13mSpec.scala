package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 twelfth-wave pin: CCNet-style perplexity bucketing. */
class Round13mSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("perplexity_bucket_filter: partition per source, ordered buckets, ceil-rank head") {
    val r = SparkEntry.queries("perplexity_bucket_filter")(spark, sf).collect()
    assert(r.nonEmpty)
    val bySource = r.groupBy(_.getAs[String]("source"))
    // every source's docs partition across its buckets
    import org.apache.spark.sql.functions._
    val docCounts = graft.core.Tables(spark, sf).documents
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("n")).toMap
    bySource.foreach { case (src, rows) =>
      val n = rows.map(_.getAs[Long]("n_docs")).sum
      assert(n == docCounts(src), s"$src: bucketed $n of ${docCounts(src)} docs")
      val shares = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(shares - 1.0) < 1e-12)
      // bucket means are ordered: head (fluent) <= middle <= tail
      def mean(b: String): Option[Double] = rows
        .find(_.getAs[String]("bucket") == b).map(_.getAs[Double]("mean_cross_entropy"))
      (mean("head"), mean("middle")) match {
        case (Some(h), Some(m)) => assert(h <= m, s"$src head $h > middle $m")
        case _ => ()
      }
      (mean("middle"), mean("tail")) match {
        case (Some(m), Some(t)) => assert(m <= t, s"$src middle $m > tail $t")
        case _ => ()
      }
      rows.foreach { row =>
        assert(row.getAs[Double]("head_threshold") <= row.getAs[Double]("tail_threshold"))
      }
      // ceil-rank + ties-to-head: head holds at least ceil(n/3) docs
      rows.find(_.getAs[String]("bucket") == "head").foreach { h =>
        assert(h.getAs[Long]("n_docs") >= (n + 2) / 3)
      }
    }
  }
}
