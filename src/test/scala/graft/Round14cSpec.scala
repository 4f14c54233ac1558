package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 streaming pin: the two SUM-merge sinks are
  * replay-idempotent — foreachBatch re-delivers the last micro-batch
  * on failure recovery, and without the applied-batch guard each
  * replay would double-count (the OR/MAX/upsert sinks absorb replays
  * naturally; the counters do not).
  */
class Round14cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("MixPlanSink.applyBatch: replaying a batch id leaves counters unchanged") {
    import graft.streaming.MixPlanSink
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("source"))
    val st = java.nio.file.Files.createTempDirectory("mix_replay").toString
    def state() = MixPlanSink.currentState(spark, st).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))).toMap
    MixPlanSink.applyBatch(docs, st, 0L)
    val after0 = state()
    assert(after0.nonEmpty)
    // failure-recovery replay of batch 0: state must not move
    MixPlanSink.applyBatch(docs, st, 0L)
    assert(state() == after0, "replayed batch double-counted")
    // the NEXT batch id still merges
    MixPlanSink.applyBatch(docs.limit(10), st, 1L)
    val after1 = state()
    assert(after1.values.map(_._1).sum == after0.values.map(_._1).sum + 10)
  }

  test("HistogramSink.applyBatch: replaying a batch id leaves buckets unchanged") {
    import graft.streaming.HistogramSink
    val vals = graft.core.Tables(spark, sf).orders
      .selectExpr("o_orderpriority AS k",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
    val st = java.nio.file.Files.createTempDirectory("hist_replay").toString
    def total() = HistogramSink.currentHistogram(spark, st)
      .agg(sum(col("c"))).collect().head.getLong(0)
    HistogramSink.applyBatch(vals, st, 0L)
    val n0 = total()
    assert(n0 > 0)
    HistogramSink.applyBatch(vals, st, 0L)
    assert(total() == n0, "replayed batch doubled the bucket mass")
    HistogramSink.applyBatch(vals.limit(7), st, 1L)
    assert(total() == n0 + 7)
  }
}
