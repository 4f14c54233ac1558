package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 behavior pins: the PPR single-task replay's branch
  * equality, and the ring-contribution channel-split refactor's
  * set identity — properties the DuckDB hash gate can't isolate
  * per branch.
  */
class Round18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Graph = graft.operators.Graph

  test("personalized_pagerank: single-task replay is bit-identical to the distributed loop") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("supp_key"), r.getAs[Long]("rank_q12"))).toSeq
    val replay = rows(Graph.personalizedPagerank(spark, sf01))
    graft.core.OwnedCaches.release()
    val loop = rows(Graph.personalizedPagerank(spark, sf01, forceLoop = true))
    graft.core.OwnedCaches.release()
    assert(replay == loop, "replay and loop must agree on the exact integer grid")
    assert(replay.nonEmpty)
  }

  test("pprReplay: inner-join semantics — absent sources emit no dst row, reached-zero rows survive") {
    // seed=0 (even), one hop to 1; 1's out-degree 1000 floors its
    // share to 0 on the second hop: node 2 must still appear (a
    // rank-0 row via the reached-zero path — the loop's inner join
    // emits it), node 4 (only reachable from the never-ranked source
    // 6) must NOT.
    val es = Array((0L, 1L, 1L), (1L, 2L, 1000L), (6L, 4L, 1L))
    val r = Graph.pprReplay(es, 1, 1000L).toMap
    assert(r.contains(1L) && !r.contains(4L) && !r.contains(2L))
    val r2 = Graph.pprReplay(es, 2, 1000L).toMap
    assert(r2.get(2L).contains(0L), "dst reached by a present source keeps its row at floored-0 rank")
    assert(!r2.contains(4L), "dst of an absent source never materializes")
  }

  test("katz_topk: single-task replay is bit-identical to the co-partitioned loop") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("katz_q6"))).toSeq
    val replay = rows(Graph.katzTopk(spark, sf01))
    graft.core.OwnedCaches.release()
    val loop = rows(Graph.katzTopk(spark, sf01, forceLoop = true))
    graft.core.OwnedCaches.release()
    assert(replay == loop, "replay and loop must agree on the exact q6 grid")
    assert(replay.nonEmpty)
  }

  test("cappedWedgeFrame: identity below the cap; tiny cap drops exactly the hub-centered wedges") {
    val sess = spark
    import sess.implicits._
    // deliberately skewed symmetric graph: node 0 is a degree-6 hub,
    // nodes 1..6 hang off it, plus a 3-path 1-2-3
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (0L, 6L),
      (1L, 2L), (2L, 3L))
    val edges = und.toDF("src", "dst")
      .unionByName(und.map(_.swap).toDF("src", "dst")).cache()
    def wset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = wset(Graph.cappedWedgeFrame(edges, Long.MaxValue))
    val atDefault = wset(Graph.cappedWedgeFrame(edges))
    assert(atDefault == uncapped, "production cap is the identity below the ceiling")
    val capped4 = wset(Graph.cappedWedgeFrame(edges, 4L))
    assert(capped4 == uncapped.filter(_._1 != 0L),
      "a binding cap drops exactly the wedges CENTERED on the hub, nothing else")
    edges.unpersist()
  }

  test("adaptive probe promotion: the routed face admits exactly the occupancy-walk cells (driver replay)") {
    val Ann = graft.operators.Ann
    val k = Ann.TwoLevelForceK
    // fixed face first (builds the shared ranked pool the walk reads)
    val (assign, _, _) = Ann.hierCellFrames(spark, sf01, Some(k))
    val pool = Ann.hierRankedPool(spark, sf01, Some(k))
      .select("va", "cl", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val homes = assign.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nVec = homes.length.toLong
    val mass = homes.groupBy(_._2).map { case (cl, xs) => cl -> xs.length.toLong }
    // the route's BUDGET-MATCHED target (nprobeFor(k) average cells),
    // not the audit's fixed 4 — the promotion matches the fixed
    // width's expected candidate mass
    val target = Ann.nprobeFor(k).toLong * ((nVec + k - 1) / k)
    // driver replay of the ann_adaptive_nprobe admission rule
    val admitted = pool.groupBy(_._1).toSeq.flatMap { case (va, cells) =>
      var before = 0L
      cells.sortBy(_._3).toSeq.flatMap { case (_, cl, _) =>
        val adm = before < target
        before += mass.getOrElse(cl, 0L)
        if (adm) Some((va, cl)) else None
      }
    }.toSet
    val expected = admitted ++ homes.map { case (v, cl) => (v, cl) }
    val (_, probesAdp, _) = Ann.hierCellFrames(spark, sf01, Some(k), adaptive = true)
    val got = probesAdp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      "production probes must be the occupancy-walk admission ∪ home cells, exactly")
    // the walk always admits at least the rank-1 cell per vector
    assert(pool.map(_._1).toSet.forall(v => got.exists(_._1 == v)))
  }

  test("wedge_cap_audit: ladder rows are monotone and the production row is clean at test scale") {
    val rows = graft.operators.Graph.wedgeCapAudit(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == Graph.WedgeCapLadder.length)
    val shares = rows.map(_.getAs[Double]("dropped_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b },
      "dropped share is non-increasing in the cap")
    assert(rows.last.getAs[Long]("n_hubs") == 0L &&
      rows.last.getAs[Double]("dropped_share") == 0.0,
      "the production WedgeDegreeCap row must be clean on the oracle graph " +
        "(the equality-below-cap license)")
    assert(rows.head.getAs[Long]("wedge_bound") > 0L)
  }
}
