package graft

import org.scalatest.funsuite.AnyFunSuite

/** Optimization-round 18 behavior pins: the quality-logreg single-task
  * GD replay's branch equality against the unrolled distributed chain
  * (same discipline as the graph centralities' replay pins — the
  * DuckDB hash gate sees only the shipped branch, so the equality of
  * branches must be pinned in-process).
  */
class Round18dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val TA = graft.operators.TextAnalysis

  test("quality logreg: single-task GD replay is bit-identical to the unrolled chain") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val feat = TA.lrFeaturesOf(TA.qualityRuleSignals(spark, dir), withLabel = true)
        .cache()
      def ws(df: org.apache.spark.sql.DataFrame): Seq[Double] = {
        val r = df.collect()
        assert(r.length == 1)
        (0 to 3).map(j => r(0).getAs[Double](s"w$j"))
      }
      val chain = ws(TA.trainQualityModel(feat))
      val replay = ws(TA.trainQualityModelReplay(feat))
      // bit-exact, not approximate: compare raw IEEE bits
      assert(chain.map(java.lang.Double.doubleToLongBits) ==
        replay.map(java.lang.Double.doubleToLongBits),
        s"$dir: chain=$chain replay=$replay")
      feat.unpersist()
    }
  }

  test("hits_scores: single-task replay is bit-identical to the normalized loop") {
    val G = graft.operators.Graph
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.collect().map(r => (r.getAs[String]("role"),
        r.getAs[Long]("node"), r.getAs[Long]("score"))).toSeq
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val replay = rows(G.hitsScores(spark, dir))
      graft.core.OwnedCaches.release()
      val loop = rows(G.hitsScores(spark, dir, forceLoop = true))
      graft.core.OwnedCaches.release()
      assert(replay == loop, s"$dir")
      assert(replay.nonEmpty)
    }
  }

  test("quality logreg auto gate admits the test corpora and routes to the replay") {
    // documents at every test SF is far under the measured cap — the
    // shipped branch at driver scale factors is the replay
    val n = graft.core.Tables.rowCount(spark, "/root/testdata/sf0.01", "documents")
    assert(n > 0 && n < 100000)
  }
}
