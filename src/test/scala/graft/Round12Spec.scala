package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-12 pins: the Louvain-refinement invariant (VERDICT r11 #2),
  * the errors.json contract (VERDICT r11 #5 — the round-10
  * silent-absence failure mode must stay unreproducible), and the
  * session-shared basket build.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("community_louvain strictly beats the CC-partition modularity baseline") {
    val row = graft.operators.Graph.communityLouvain(spark, sf).collect().head
    val qCc = row.getAs[Double]("q_cc")
    val qLv = row.getAs[Double]("q_louvain")
    assert(row.getAs[Long]("n_edges") > 0)
    // mutual-best merges are vertex-disjoint, so their exact gains
    // add: every round that merges anything strictly increases Q.
    // At sf0.001 the support graph is one giant component (Q_cc = 0)
    // and seven merge rounds reach ~0.08 — the refinement finds
    // structure disconnection alone cannot.
    assert(qLv > qCc,
      s"louvain refinement must beat the CC baseline: q_louvain=$qLv q_cc=$qCc")
    assert(row.getAs[Long]("n_comm_louvain") >= 1)
  }

  test("community_louvain modularity matches an independent recompute of its own labels") {
    // re-derive Q_cc through graph_modularity (same labels, same
    // expression, independently assembled plan) — the two operators
    // must agree bit-for-bit on the baseline score
    val louvain = graft.operators.Graph.communityLouvain(spark, sf).collect().head
    val gm = graft.operators.Graph.graphModularity(spark, sf).collect().head
    assert(louvain.getAs[Double]("q_cc") == gm.getAs[Double]("modularity"))
    assert(louvain.getAs[Long]("n_comm_cc") == gm.getAs[Long]("n_communities"))
  }

  test("Verify.run leaves an _ERROR marker and an errors.json entry for a failing query") {
    val out = Files.createTempDirectory("graft_verify_err").toString
    // a query set where one member MUST fail: bogus input dir
    Verify.run(spark, "/nonexistent/graft_dir", out, Set("q6_revenue"))
    val marker = Paths.get(s"$out/q6_revenue/_ERROR")
    assert(Files.exists(marker), "failing query must leave an _ERROR marker")
    assert(Files.readString(marker).nonEmpty)
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\"q6_revenue\""),
      s"errors.json must carry the failing query, got: $errJson")
    // the oracle dump must still be written (driver-safe contract)
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
  }

  test("Verify.run on a good dir writes parquet and an empty errors.json") {
    val out = Files.createTempDirectory("graft_verify_ok").toString
    Verify.run(spark, sf, out, Set("q6_revenue"))
    assert(!Files.exists(Paths.get(s"$out/q6_revenue/_ERROR")))
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.trim == "{}", s"expected empty errors.json, got: $errJson")
  }

  test("ann_frontier_eval: IVF recall is monotone in nprobe and cost points are ordered") {
    val rows = graft.operators.Ann.annFrontierEval(spark, sf).collect()
      .map(r => r.getAs[String]("retriever") ->
        (r.getAs[Long]("n_cand"), r.getAs[Double]("recall_at_k"))).toMap
    assert(rows.keySet == Set("ivf_np1", "ivf_np3", "ivf_np5", "lsh_t8", "pq_sl50"))
    // nprobe widens the candidate set (superset), and exact re-rank
    // makes recall monotone in the candidate set — both directions
    assert(rows("ivf_np1")._1 <= rows("ivf_np3")._1)
    assert(rows("ivf_np3")._1 <= rows("ivf_np5")._1)
    assert(rows("ivf_np1")._2 <= rows("ivf_np3")._2)
    assert(rows("ivf_np3")._2 <= rows("ivf_np5")._2)
    rows.values.foreach { case (n, r) =>
      assert(n >= 0 && r >= 0.0 && r <= 1.0)
    }
  }

  test("minhash_band_tune: candidate sets are nested across band configs") {
    // (8,8) bands align on (16,4) band boundaries which align on
    // (32,2): a collision at coarse rows implies collisions in both
    // aligned finer-row halves, so candidate sets nest by config
    val rows = graft.operators.Dedup.minhashBandTune(spark, sf).collect()
      .map(r => (r.getAs[Int]("bands"),
        (r.getAs[Long]("n_candidate_pairs"), r.getAs[Long]("n_true_pairs"),
          r.getAs[Double]("precision_at_tau")))).toMap
    assert(rows.keySet == Set(32, 16, 8))
    assert(rows(32)._1 >= rows(16)._1 && rows(16)._1 >= rows(8)._1)
    assert(rows(32)._2 >= rows(16)._2 && rows(16)._2 >= rows(8)._2)
    rows.values.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0) }
  }

  test("time_decay_attribution conserves total purchase revenue") {
    import org.apache.spark.sql.functions._
    val attributed = graft.operators.Commerce.timeDecayAttribution(spark, sf)
      .agg(sum(col("attributed_revenue"))).collect().head.getDouble(0)
    val total = TestSpark.spark.read
      .parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")))
      .collect().head.getLong(0) / 100.0
    // rounding each conversion's share to 1e-6 cents bounds the drift
    // at purchases * 1e-6 cents
    assert(math.abs(attributed - total) < 1.0,
      s"attributed=$attributed total=$total")
  }

  test("abc_xyz_matrix cells partition the part set") {
    import org.apache.spark.sql.functions._
    val cells = graft.operators.Reports.abcXyzMatrix(spark, sf)
    val nParts = cells.agg(sum(col("n_parts"))).collect().head.getLong(0)
    val distinctParts = TestSpark.spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey")).distinct().count()
    assert(nParts == distinctParts)
    val share = cells.agg(sum(col("revenue_share"))).collect().head.getDouble(0)
    assert(math.abs(share - 1.0) < 1e-9)
  }

  test("late_dim_backfill fully repairs when the dimension catches up") {
    val row = graft.operators.Incremental.lateDimBackfill(spark, sf).collect().head
    assert(row.getAs[Long]("n_unresolved") == 0L)
    assert(row.getAs[Double]("repair_coverage") == 1.0)
    assert(row.getAs[Long]("n_missing_at_load") > 0L,
      "the simulated late slice must actually hit some facts")
  }

  test("basket_lift and basket_triples plan-match one session-shared basket build") {
    spark.catalog.clearCache()
    graft.operators.Commerce.basketLift(spark, sf).collect()
    graft.core.OwnedCaches.release()
    val cachedAfterLift = spark.sparkContext.getPersistentRDDs.size
    // the shared brandBaskets frame must SURVIVE release() (un-owned)
    assert(cachedAfterLift >= 1,
      "brandBaskets must stay session-cached after basket_lift")
    graft.operators.Commerce.basketTriples(spark, sf).collect()
    graft.core.OwnedCaches.release()
    // triples must not register a second copy of the same build
    assert(spark.sparkContext.getPersistentRDDs.size == cachedAfterLift,
      "basket_triples must plan-match basket_lift's cached basket build")
  }
}
