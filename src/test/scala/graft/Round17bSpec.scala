package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-17 second-wave behavior pins (graph walk, motif census,
  * diffusion fit, lexical profiles) — properties the DuckDB hash gate
  * cannot see.
  */
class Round17bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Graph = graft.operators.Graph
  private val Commerce = graft.operators.Commerce
  private val Text = graft.operators.TextAnalysis

  test("personalized_pagerank: restart mass concentrates in the seed's neighborhood") {
    val rows = Graph.personalizedPagerank(spark, sf01).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ranks = rows.map(_.getAs[Long]("rank_q12"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b }, "sorted descending")
    assert(ranks.forall(_ > 0))
    // the top-ranked supplier must be a DIRECT neighbor of the seed:
    // restart mass re-injects at the seed every round, so 1-hop
    // suppliers dominate any 3-hop supplier reached via dilution
    val edges = Graph.custSuppEdges(spark, sf01)
    val seed = edges.agg(min(when(col("src") % 2 === 0, col("src")))).collect()(0).getLong(0)
    val direct = edges.filter(col("src") === seed)
      .select(col("dst")).collect().map(_.getLong(0)).toSet
    val top = rows.head.getAs[Long]("supp_key") * 2 + 1
    assert(direct.contains(top), "top PPR supplier is 1-hop from the seed")
  }

  test("four_cycle_count: matches a driver-side census on the collected support graph") {
    val r = Graph.fourCycleCount(spark, sf01).collect()(0)
    // replay: collect the (small at test SF) support edge list and
    // recount via the same diagonal identity computed independently
    val t = graft.core.Tables(spark, sf01)
    val und = t.lineitem
      .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("b"))
      .select(explode(col("b")).as("p1"), col("b"))
      .select(col("p1"), explode(col("b")).as("p2"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("p1", "p2").collect().map(x => (x.getLong(0), x.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nodes = adj.keys.toArray.sorted
    var cyc2 = 0L
    for (i <- nodes.indices; j <- (i + 1) until nodes.length) {
      val cd = (adj(nodes(i)) & adj(nodes(j))).size.toLong
      cyc2 += cd * (cd - 1) / 2
    }
    assert(r.getAs[Long]("n_edges") == und.length.toLong)
    assert(r.getAs[Long]("four_cycles") == cyc2 / 2,
      "diagonal-identity census must match the driver replay")
  }

  test("bass_diffusion_fit: coefficients solve the normal equations (driver Cramer replay)") {
    val r = Commerce.bassDiffusionFit(spark, sf01).collect()(0)
    import spark.implicits._
    val t = graft.core.Tables(spark, sf01)
    val xy = t.orders
      .groupBy(col("o_custkey"))
      .agg(min(expr("year(o_orderdate) * 100 + month(o_orderdate)")).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("s"))
      .orderBy("m").select(col("m"), col("s")).as[(Int, Long)].collect()
    val mtot = xy.map(_._2).sum
    // x = floor(1e4 · N(t−1)/m) for months t ≥ 2, y = S(t)
    val pts2 = {
      var c = 0L
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      xy.zipWithIndex.foreach { case ((_, s), i) =>
        if (i > 0) buf += (((c * 10000L) / mtot, s))
        c += s
      }
      buf.toArray
    }
    val n = pts2.length.toDouble
    def S(f: ((Long, Long)) => Double): Double = pts2.map(f).sum
    val (sx, sx2, sx3, sx4) = (S(_._1.toDouble), S(p => math.pow(p._1.toDouble, 2)),
      S(p => math.pow(p._1.toDouble, 3)), S(p => math.pow(p._1.toDouble, 4)))
    val (sy, sxy, sx2y) = (S(_._2.toDouble), S(p => p._1.toDouble * p._2),
      S(p => p._1.toDouble * p._1.toDouble * p._2))
    def det3(a: Array[Double]): Double =
      a(0) * (a(4) * a(8) - a(5) * a(7)) - a(1) * (a(3) * a(8) - a(5) * a(6)) +
        a(2) * (a(3) * a(7) - a(4) * a(6))
    val d = det3(Array(n, sx, sx2, sx, sx2, sx3, sx2, sx3, sx4))
    val da = det3(Array(sy, sx, sx2, sxy, sx2, sx3, sx2y, sx3, sx4))
    val dc = det3(Array(n, sx, sy, sx, sx2, sxy, sx2, sx3, sx2y))
    assert(r.getAs[Long]("n_months") == pts2.length.toLong)
    assert(math.abs(r.getAs[Double]("coef_a") - da / d) <
      1e-6 * math.max(1.0, math.abs(da / d)), "intercept matches driver Cramer")
    assert(math.abs(r.getAs[Double]("coef_c") - dc / d) <
      1e-6 * math.max(1e-12, math.abs(dc / d)), "quadratic matches driver Cramer")
    assert(math.abs(r.getAs[Double]("p_hat") - r.getAs[Double]("coef_a") / mtot) < 1e-12)
  }

  test("brunner_munzel: relative effect is Cliff's delta re-expressed, p_hat in [0,1]") {
    val Stats = graft.operators.Stats
    val bm = Stats.brunnerMunzel(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("p_hat")).toMap
    val cd = Stats.cliffDelta(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("delta")).toMap
    assert(bm.size == 10)
    bm.foreach { case (pair, p) =>
      assert(p >= 0.0 && p <= 1.0, s"$pair relative effect in [0,1]")
      // p̂ = P(X_b>X_a) + ½P(=) = (1 − δ_ab)/2 — two operators, one grid
      assert(math.abs(p - (1.0 - cd(pair)) / 2.0) < 1e-9,
        s"$pair BM relative effect must equal (1 - cliff delta)/2")
    }
  }

  test("ttr_by_source: ratios in range, vocabulary never exceeds token mass") {
    val rows = Text.ttrBySource(spark, sf01).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("vocab_size") <= r.getAs[Long]("n_tokens"))
      val st = r.getAs[Double]("source_ttr"); val mt = r.getAs[Double]("mean_doc_ttr")
      assert(st > 0 && st <= 1.0 && mt > 0 && mt <= 1.0)
      // doc-level diversity can only exceed corpus-level: types shared
      // across docs deflate V/N but every doc counts them fresh
      assert(mt >= st - 1e-9)
    }
  }

  test("kl_vs_corpus_by_source: nonnegative, matches a driver replay on one source") {
    val rows = Text.klVsCorpusBySource(spark, sf01).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[Double]("kl_nats") >= -1e-9, "KL >= 0"))
    // driver replay for src0: tf maps from the same whitespace tokens
    val docs = graft.core.Tables(spark, sf01).documents
      .select(col("source"), col("text")).collect()
    val tok: Array[(String, String)] = docs.flatMap(r =>
      r.getString(1).split(" +").filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val corpusTf = tok.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTot = tok.length.toDouble
    val srcTok = tok.filter(_._1 == "src0").map(_._2)
    val ns = srcTok.length.toDouble
    val kl = srcTok.groupBy(identity).map { case (t, xs) =>
      val p = xs.length / ns
      p * math.log((xs.length * nTot) / (corpusTf(t) * ns))
    }.sum
    val got = rows.find(_.getString(0) == "src0").get.getAs[Double]("kl_nats")
    assert(math.abs(got - kl) < 1e-6, "src0 KL matches the driver replay")
  }
}
