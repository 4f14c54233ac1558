package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-18 third-wave behavior pins: the paired/matched-category
  * test batch (sign, Cochran Q, Bowker) and the association trio
  * (CvM, Theil U, GK lambda) — mathematical invariants and
  * cross-operator dominances the DuckDB hash gate cannot see.
  */
class Round18cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Stats = graft.operators.Stats

  test("sign_test: counts partition the customers and z carries the majority sign") {
    val r = Stats.signTest(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val n = r.getAs[Long]("n_customers")
    val (np, nm, nt) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Long]("n_tie"))
    assert(np + nm + nt == n)
    val z = r.getAs[Double]("z_stat")
    if (np != nm) assert(z * (np - nm) > 0) else assert(z == 0.0)
  }

  test("cochran_q: nonnegative, bounded counts, and k=2-consistency of the formula") {
    val r = Stats.cochranQ(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val n = r.getAs[Long]("n_customers")
    assert(r.getAs[Double]("q_stat") >= 0.0)
    Seq("n_active_t0", "n_active_t1", "n_active_t2").foreach { c =>
      val v = r.getAs[Long](c); assert(v >= 0 && v <= n)
    }
    assert(r.getAs[Long]("df") == 2L)
  }

  test("bowker_test: nonnegative stat, df counts non-empty pairs, customer total matches segment_migration") {
    val b = Stats.bowkerTest(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(b.getAs[Double]("bowker_stat") >= 0.0)
    assert(b.getAs[Long]("df") >= 0 && b.getAs[Long]("df") <= 10)
    val mig = graft.operators.Reports.segmentMigration(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(mig.map(_.getAs[Long]("n_customers")).sum == b.getAs[Long]("n_customers"))
  }

  test("cramer_von_mises: nonnegative and dominated by the KS sup-norm bound") {
    val cvm = Stats.cramerVonMises(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("cvm_stat")))).toMap
    graft.core.OwnedCaches.release()
    val ks = Stats.ksTest(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("d_stat"))).toMap
    graft.core.OwnedCaches.release()
    assert(cvm.size == 10)
    cvm.foreach { case (pair, (na, nb, t)) =>
      assert(t >= 0.0)
      val d = ks(pair); val n = (na + nb).toDouble
      // sum_v w·(Fa−Fb)^2 <= N·D^2, so T <= na·nb·D^2/N
      assert(t <= na * nb * d * d / n + 1e-9, s"$pair: T=$t vs bound")
    }
  }

  test("theil_u: direction-normalized shares in [0,1], symmetric between the directed pair") {
    val r = Stats.theilU(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val us = r.getAs[Double]("u_segment_given_priority")
    val up = r.getAs[Double]("u_priority_given_segment")
    val sym = r.getAs[Double]("u_symmetric")
    Seq(us, up, sym).foreach(u => assert(u >= -1e-9 && u <= 1.0 + 1e-9))
    // sym = harmonic mean of the directed pair -> bracketed by them
    assert(sym >= math.min(us, up) - 1e-9 && sym <= math.max(us, up) + 1e-9)
    val mi = r.getAs[Double]("h_segment") + r.getAs[Double]("h_priority") -
      r.getAs[Double]("h_joint")
    assert(mi >= -1e-7, s"mutual information must be nonnegative: $mi")
  }

  test("attribute_assortativity: coefficient and same-nation share are valid") {
    val r = graft.operators.Graph.attributeAssortativity(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Long]("n_same_nation") <= r.getAs[Long]("n_edges"))
    val share = r.getAs[Double]("share_same_nation")
    assert(share >= 0.0 && share <= 1.0)
    val a = r.getAs[Double]("assortativity_r")
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12)
  }

  test("transition_reciprocity: matched mass bounded by off-diagonal mass") {
    val r = Stats.transitionReciprocity(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Long]("n_self") + r.getAs[Long]("n_offdiag") ==
      r.getAs[Long]("n_transitions"))
    assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_offdiag"))
    val rho = r.getAs[Double]("reciprocity")
    assert(rho >= 0.0 && rho <= 1.0)
  }

  test("permutation_entropy: bounded by ln 6 and consistent with the pattern count") {
    val r = Stats.permutationEntropy(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val h = r.getAs[Double]("h_perm")
    assert(h >= 0.0 && h <= math.log(6.0) + 1e-9)
    assert(r.getAs[Long]("n_patterns") >= 1 && r.getAs[Long]("n_patterns") <= 6)
    // H <= ln(#observed patterns)
    assert(h <= math.log(r.getAs[Long]("n_patterns").toDouble) + 1e-9)
    val hn = r.getAs[Double]("h_norm")
    assert(hn >= 0.0 && hn <= 1.0 + 1e-9)
  }

  test("l_diversity_audit: l in 1..4, classes hold at least l members, shares sum to 1") {
    val rows = graft.etl.QualityChecks.lDiversityAudit(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1 && l <= 4)
      assert(r.getAs[Long]("min_k") >= l, "a class needs >= l members to show l bands")
    }
    val shareSum = rows.map(_.getAs[Double]("share_customers")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("t_closeness_audit: thresholds are monotone and the class universe matches k_anonymity") {
    val r = graft.etl.QualityChecks.tClosenessAudit(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val t = r.getAs[Double]("max_t")
    assert(t >= 0.0 && t <= 1.0 + 1e-12)
    val (a, b, c) = (r.getAs[Long]("n_above_020"), r.getAs[Long]("n_above_033"),
      r.getAs[Long]("n_above_050"))
    assert(a >= b && b >= c && c >= 0)
    assert(a <= r.getAs[Long]("n_classes"))
    val kan = graft.etl.QualityChecks.kAnonymityAudit(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(kan.map(_.getAs[Long]("n_classes")).sum == r.getAs[Long]("n_classes"),
      "t-closeness iterates the same quasi-identifier classes as k-anonymity")
  }

  test("fleiss_kappa: agreement shares are valid and kappa is bounded above by 1") {
    val r = Stats.fleissKappa(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val (pb, pe) = (r.getAs[Double]("p_bar"), r.getAs[Double]("p_e"))
    assert(pb >= 0.0 && pb <= 1.0 + 1e-12)
    assert(pe >= 0.0 && pe <= 1.0 + 1e-12)
    assert(r.getAs[Double]("kappa") <= 1.0 + 1e-12)
    assert(r.getAs[Long]("n_items") > 0)
  }

  test("seasonal_mann_kendall: variance never exceeds the unblocked mann_kendall variance") {
    val sk = Stats.seasonalMannKendall(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val mk = Stats.mannKendallTrend(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(sk.getAs[Long]("n_months") == mk.getAs[Long]("n_months"))
    // sum_s n_s(n_s-1)(2n_s+5) <= n(n-1)(2n+5): restricting pairs to
    // seasons can only shrink the null variance
    assert(sk.getAs[Double]("var_s") <= mk.getAs[Double]("var_s") + 1e-9)
    assert(sk.getAs[Double]("var_s") > 0.0)
  }

  test("sample_entropy: template counts nest and the entropy is nonnegative") {
    val r = Stats.sampleEntropy(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val (a, b, n) = (r.getAs[Long]("a_count"), r.getAs[Long]("b_count"),
      r.getAs[Long]("n_pairs"))
    assert(a <= b && b <= n)
    assert(r.getAs[Long]("r_tol") >= 0)
    assert(r.getAs[Double]("sampen") >= 0.0)
  }

  test("breslow_day: chi-square nonnegative, df tracks the used strata") {
    val r = graft.operators.Commerce.breslowDay(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Double]("bd_stat") >= 0.0)
    assert(r.getAs[Double]("or_mh") > 0.0)
    val used = r.getAs[Long]("n_strata_used")
    assert(used >= 0 && used <= 5)
    assert(r.getAs[Long]("df") == math.max(0L, used - 1))
  }

  test("four_cycle_clustering: coefficient is a share and the censuses cross-match") {
    val Graph = graft.operators.Graph
    val r = Graph.fourCycleClustering(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val coef = r.getAs[Double]("c4_coefficient")
    assert(coef >= 0.0 && coef <= 1.0 + 1e-12, "4*C4 <= P3 makes this a share")
    val fc = Graph.fourCycleCount(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Long]("four_cycles") == fc.getAs[Long]("four_cycles"),
      "rectangle census must match four_cycle_count on the same graph")
    val tc = Graph.triangleCount(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Long]("triangles") == tc.getAs[Long]("n_triangles"),
      "codegree-recovered triangles must match the orientation census")
  }

  test("eigenvector_centrality: top-k is sorted, scores are shares, ratio positive") {
    val rows = graft.operators.Graph.eigenvectorCentrality(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == 15)
    val w = rows.map(_.getAs[Long]("walks4"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b }, "descending walk counts")
    rows.foreach { r =>
      val sc = r.getAs[Double]("score")
      assert(sc > 0.0 && sc <= 1.0)
      assert(r.getAs[Double]("lambda_hat") > 0.0)
    }
  }

  test("eigenvector_centrality: single-task replay is bit-identical to the distributed loop") {
    val Graph = graft.operators.Graph
    val fast = Graph.eigenvectorCentrality(spark, sf01, forceLoop = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    graft.core.OwnedCaches.release()
    val loop = Graph.eigenvectorCentrality(spark, sf01, forceLoop = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    graft.core.OwnedCaches.release()
    assert(fast.toSeq == loop.toSeq,
      "replay and loop must agree on every row, score bits included")
  }

  test("vocab_overlap_matrix: jaccard <= overlap coefficient <= 1, shared bounded by the smaller vocabulary") {
    val rows = graft.operators.TextAnalysis.vocabOverlapMatrix(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, o) = (r.getAs[Double]("jaccard"), r.getAs[Double]("overlap_coef"))
      assert(j >= 0.0 && j <= o + 1e-12 && o <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_shared") <=
        math.min(r.getAs[Long]("vocab_a"), r.getAs[Long]("vocab_b")))
    }
  }

  test("welch_anova: F nonnegative, df2 positive and below the pooled df") {
    val r = Stats.welchAnova(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    assert(r.getAs[Double]("f_stat") >= 0.0)
    assert(r.getAs[Int]("df1") == 4)
    val df2 = r.getAs[Double]("df2_welch")
    assert(df2 > 0.0 && df2 <= (r.getAs[Long]("n_orders") - 5).toDouble)
  }

  test("dunn_test: mean ranks match kruskal_wallis and satisfy the rank-sum identity") {
    val rows = Stats.dunnTest(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == 10)
    val ranks = (rows.map(r => (r.getAs[String]("prio_a"),
        r.getAs[Long]("n_a"), r.getAs[Double]("mean_rank_a"))) ++
      rows.map(r => (r.getAs[String]("prio_b"),
        r.getAs[Long]("n_b"), r.getAs[Double]("mean_rank_b")))).distinct
    assert(ranks.length == 5)
    val kw = Stats.kruskalWallis(spark, sf01).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Double]("mean_rank"))).toMap
    graft.core.OwnedCaches.release()
    ranks.foreach { case (p, _, mr) =>
      assert(math.abs(kw(p) - mr) < 1e-9, s"$p mean rank drifted from kruskal_wallis")
    }
    val n = ranks.map(_._2).sum
    val rankMass = ranks.map { case (_, ng, mr) => ng * mr }.sum
    assert(math.abs(rankMass - n.toDouble * (n + 1) / 2.0) < 1e-3,
      "sum of group rank masses must equal N(N+1)/2")
  }

  test("goodman_kruskal_lambda: PRE shares in [0,1] and modal sums dominate the margins") {
    val r = Stats.goodmanKruskalLambda(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val ls = r.getAs[Double]("lambda_segment_given_priority")
    val lp = r.getAs[Double]("lambda_priority_given_segment")
    Seq(ls, lp).foreach(l => assert(l >= 0.0 && l <= 1.0))
    assert(r.getAs[Long]("sum_modal_by_priority") <= r.getAs[Long]("n_orders"))
    assert(r.getAs[Long]("sum_modal_by_segment") <= r.getAs[Long]("n_orders"))
  }
}
