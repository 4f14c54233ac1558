package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 streaming pin: the vector-ingest sink (streaming face of
  * `dedup_embedding_incremental`) screens against state via the same
  * quantizer cells as the batch family, admits exactly what the batch
  * recompute admits, and absorbs replays without markers.
  */
class Round15cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def setup(): (String, org.apache.spark.sql.DataFrame) = {
    import graft.streaming.VectorIngestSink
    val st = java.nio.file.Files.createTempDirectory("vec_ingest").toString
    // the offline-training artifact: the batch family's final Lloyd's
    // centroids — installing the SAME quantizer makes the sink's cells
    // (and so its candidate relation) identical to the batch ops'
    val (_, _, cents, _) = graft.operators.Ann.kmeansAssign(spark, sf)
    VectorIngestSink.installQuantizer(cents, st)
    val vectors = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("embedding"))
    (st, vectors)
  }

  test("VectorIngestSink: sequential ingest matches the batch candidate relation; replays are no-ops") {
    import graft.streaming.VectorIngestSink
    val (st, vectors) = setup()
    val even = vectors.filter(col("vec_id") % 2 === 0)
    val odd = vectors.filter(col("vec_id") % 2 === 1)
    // batch 0: empty corpus -> everything admits
    VectorIngestSink.applyBatch(even, st)
    val n0 = VectorIngestSink.currentCorpus(spark, st).count()
    assert(n0 == even.count(), "empty-corpus batch must admit everything")
    // REPLAY batch 0: state unchanged (id-keyed insert absorbs it)
    VectorIngestSink.applyBatch(even, st)
    assert(VectorIngestSink.currentCorpus(spark, st).count() == n0)
    // batch 1 verdicts must equal the batch-op recompute: a new(odd)
    // vector is rejected iff it has a verified spanning pair to an
    // even vector under the SAME multi-probe cell relation
    val verdicts = VectorIngestSink.screen(odd, st)
      .select(col("vec_id"), col("admitted"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expectedRejected = graft.operators.Ann.cellNearDupPairs(spark, sf)
      .collect()
      .flatMap { r =>
        val a = r.getAs[Long]("vec_a"); val b = r.getAs[Long]("vec_b")
        if (a % 2 != b % 2) Seq(if (a % 2 == 1) a else b) else Nil
      }.toSet
    verdicts.foreach { case (id, admitted) =>
      assert(admitted == !expectedRejected.contains(id),
        s"vec $id: sink says admitted=$admitted, batch relation says rejected=${expectedRejected.contains(id)}")
    }
    // ingest batch 1; final corpus = even + admitted odd
    VectorIngestSink.applyBatch(odd, st)
    val finalIds = VectorIngestSink.currentCorpus(spark, st)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expectedIds = even.collect().map(_.getLong(0)).toSet ++
      verdicts.filter(_._2).keySet
    assert(finalIds == expectedIds)
    // probes persisted with every resident (the symmetric-screen artifact)
    val probeLens = VectorIngestSink.currentCorpus(spark, st)
      .select(size(col("probes"))).collect().map(_.getInt(0))
    assert(probeLens.forall(_ == VectorIngestSink.NProbe))
  }

  test("VectorIngestSink.start: streamed ingest equals direct applyBatch state") {
    import graft.streaming.VectorIngestSink
    val (st, vectors) = setup()
    val (stRef, _) = setup()
    val in = java.nio.file.Files.createTempDirectory("vec_in").toString
    val b0 = vectors.filter(col("vec_id") % 3 === 0)
    val b1 = vectors.filter(col("vec_id") % 3 =!= 0)
    b0.coalesce(1).write.mode("overwrite").json(s"$in/b0")
    val q = VectorIngestSink.start(spark, s"$in/*", st)
    try {
      q.processAllAvailable()
      b1.coalesce(1).write.mode("overwrite").json(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    VectorIngestSink.applyBatch(b0, stRef)
    VectorIngestSink.applyBatch(b1, stRef)
    def ids(d: String) = VectorIngestSink.currentCorpus(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids(st) == ids(stRef),
      "streamed state must equal the direct batch-face state")
  }
}
