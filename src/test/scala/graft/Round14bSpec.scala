package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 streaming pin: the corpus-mix monitor merges losslessly
  * across micro-batches and its live plan equals the batch operator.
  */
class Round14bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("MixPlanSink: cross-batch counters equal one batch aggregate;" +
    " live plan equals corpus_mix_plan") {
    import graft.streaming.MixPlanSink
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("source"))
    val in = java.nio.file.Files.createTempDirectory("mix_in").toString
    val st = java.nio.file.Files.createTempDirectory("mix_state").toString
    // two micro-batches split by doc id parity — every source appears
    // in both, so the merge path does real summing
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").json(s"$in/b0")
    val q = MixPlanSink.start(spark, s"$in/*", st)
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("overwrite").json(s"$in/b1")
      q.processAllAvailable()
      // lossless merge: state == one aggregate over everything
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))).toMap
      val want = m(MixPlanSink.perSource(docs))
      val got = m(MixPlanSink.currentState(spark, st))
      assert(got == want, "merged counters must equal the one-shot aggregate")
      // and the live plan is row-identical to the batch operator
      val batchPlan = SparkEntry.queries("corpus_mix_plan")(spark, sf).collect()
      val livePlan = MixPlanSink.currentPlan(spark, st).collect()
      assert(livePlan.map(_.toSeq).toSeq == batchPlan.map(_.toSeq).toSeq,
        "streaming-maintained plan must equal the batch operator row-for-row")
    } finally q.stop()
  }
}
