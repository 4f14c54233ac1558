package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins: the two new measured-replay branches (VERDICT r13
  * #2 — triangle_count and embedding_top_eigen regressed on pure
  * stage latency) produce results row-identical to the distributed
  * branches they admit away from.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("triangle_count: single-task replay equals the distributed wedge join") {
    import graft.operators.Graph
    def row(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val replay = row(Graph.triangleCount(spark, sf))
    graft.core.OwnedCaches.release()
    val dist = row(Graph.triangleCount(spark, sf, forceDistributed = true))
    graft.core.OwnedCaches.release()
    assert(replay == dist, s"replay $replay vs distributed $dist")
    assert(replay.head._3 >= 0 && replay.head._2 > 0)
  }

  test("triangle_count replay body: counts a known graph exactly") {
    import graft.operators.Graph
    // K4 (4 triangles) + a pendant edge + a disconnected K3 (1)
    val k4 = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val es = (k4 :+ (3L, 9L)) ++ Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val (n, m, tri) = Graph.triangleReplay(es.toArray).next()
    assert((n, m, tri) == ((8L, 10L, 5L)))
  }

  test("embedding_top_eigen: single-task replay equals the distributed iteration") {
    import graft.operators.Ann
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val replay = rows(Ann.embeddingTopEigen(spark, sf))
    graft.core.OwnedCaches.release()
    val dist = rows(Ann.embeddingTopEigen(spark, sf, forceDistributed = true))
    graft.core.OwnedCaches.release()
    assert(replay == dist)
    assert(replay.map(_._1) == replay.map(_._1).sorted && replay.nonEmpty)
  }
}
