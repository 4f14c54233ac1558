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

    val streamed = QualityScoreStream.scores(spark, out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("logit"), r.getAs[Boolean]("admit"))).toMap
    assert(streamed.size == batch.size,
      s"every batch-scorable doc must be scored exactly once: ${streamed.size} vs ${batch.size}")
    batch.foreach { case (id, (z, adm)) =>
      assert(streamed(id)._1 == z, s"doc $id: streamed logit must be bit-identical")
      assert(streamed(id)._2 == adm, s"doc $id: streamed admit must match")
    }
  }
}
