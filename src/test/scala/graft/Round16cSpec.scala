package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16c pin: the train-batch / serve-stream contract of the
  * distilled quality filter — a streamed document must carry the
  * bit-identical logit the batch query assigns it, across micro-batch
  * splits and under replay.
  */
class Round16cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"

  test("QualityScoreStream: streamed logits == batch logits bit-for-bit, split-invariant") {
    import graft.streaming.QualityScoreStream
    val weights = QualityScoreStream.trainAndInstall(spark, sf01)
    assert(weights.exists(_ != 0.0), "training must move the weights")

    // batch truth from the oracled query itself
    val batch = graft.operators.TextAnalysis.qualityLogregFilter(spark, sf01)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("logit"), r.getAs[Boolean]("admit"))).toMap

    // stream the same corpus as JSONL in two arbitrary chunks
    val docs = graft.core.Tables(spark, sf01).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def jsonl(rows: Array[(Long, String)]): String = rows.map { case (id, t) =>
      val esc = t.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s"""{"doc_id":$id,"text":"$esc"}"""
    }.mkString("\n")
    val in = java.nio.file.Files.createTempDirectory("graft_qs_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_qs_out").toString + "/scores"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_qs_ck").toString
    val (a, b) = docs.splitAt(docs.length / 3)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.jsonl"), jsonl(a))
    val q = QualityScoreStream.start(spark, weights, in, out, ckpt)
    try {
      q.processAllAvailable()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b2.jsonl"), jsonl(b))
      q.processAllAvailable()
    } finally q.stop()

    val rows = QualityScoreStream.scores(spark, out).collect()
    val streamed = rows.map(r => r.getAs[Long]("doc_id") ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getAs[Boolean]("admit"))).toMap
    // coverage: EVERY streamed document appears exactly once — docs
    // that normalize to zero tokens carry a null logit + admit=false
    assert(rows.length == docs.length,
      s"every streamed doc must be scored exactly once: ${rows.length} vs ${docs.length}")
    assert(streamed.count(_._2._1.isDefined) == batch.size,
      "batch-scorable docs must carry a real logit")
    batch.foreach { case (id, (z, adm)) =>
      assert(streamed(id)._1.contains(z), s"doc $id: streamed logit must be bit-identical")
      assert(streamed(id)._2 == adm, s"doc $id: streamed admit must match")
    }
    streamed.filterNot(kv => batch.contains(kv._1)).foreach { case (id, (l, adm)) =>
      assert(l.isEmpty && !adm, s"zero-token doc $id must be (null logit, admit=false)")
    }
  }

  test("QualityScoreStream: a replayed micro-batch overwrites its own partition (idempotent)") {
    import graft.streaming.QualityScoreStream
    // scores() before any commit: empty typed frame, not an exception
    val empty = java.nio.file.Files.createTempDirectory("graft_qs_none").toString + "/never"
    assert(QualityScoreStream.scores(spark, empty).count() == 0L)

    // the replay mechanism itself: writing the same batch_id twice with
    // the stream's writer settings leaves exactly one copy (dynamic
    // partition overwrite replaces only the replayed batch's partition)
    val out = java.nio.file.Files.createTempDirectory("graft_qs_replay").toString + "/scores"
    def writeBatch(id: Long, docIds: Seq[Long]): Unit =
      spark.createDataFrame(docIds.map(d => (d, 0.5, true, id)))
        .toDF("doc_id", "logit", "admit", "batch_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    writeBatch(0L, Seq(1L, 2L))
    writeBatch(1L, Seq(3L))
    writeBatch(1L, Seq(3L)) // the replay
    val got = QualityScoreStream.scores(spark, out).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L),
      s"replayed batch must not duplicate rows: ${got.toSeq}")
  }
}
