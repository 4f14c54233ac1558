package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 continuation pins — invariants for the 13 operators added
  * after the r11-verdict items closed (stats inference, concentration
  * KPIs, retrieval evals, corpus-growth curves, dedup/freshness
  * diagnostics).
  */
class Round12bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("anova_oneway: partition identity and effect size bounds") {
    val r = graft.operators.Stats.anovaOneway(spark, sf).collect().head
    val ssb = r.getAs[Double]("ssb")
    val ssw = r.getAs[Double]("ssw")
    val eta = r.getAs[Double]("eta_sq")
    assert(r.getAs[Int]("k_groups") == 5)
    assert(r.getAs[Long]("n_events") > 0)
    assert(ssb >= 0 && ssw > 0, s"sums of squares must be nonnegative: ssb=$ssb ssw=$ssw")
    assert(eta >= 0 && eta <= 1)
    // eta must equal ssb/(ssb+ssw) as computed from the emitted parts
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-12)
  }

  test("bootstrap_poisson_ci: interval is ordered and brackets the point estimate") {
    val r = graft.operators.Stats.bootstrapPoissonCi(spark, sf).collect().head
    val lo = r.getAs[Double]("ci_lo")
    val hi = r.getAs[Double]("ci_hi")
    val pt = r.getAs[Double]("point_mean")
    assert(r.getAs[Long]("n_boot") == 40L)
    assert(lo < hi, s"percentile interval must be ordered: [$lo, $hi]")
    // Poisson resample means scatter AROUND the full-sample mean; a
    // point estimate outside its own 95% interval means the weight
    // draw is broken, not that the data is surprising
    assert(pt > lo && pt < hi, s"point $pt outside [$lo, $hi]")
  }

  test("pareto_threshold: monotone in pct and reaches each revenue target") {
    val rows = graft.operators.Reports.paretoThreshold(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Seq(50, 80, 90))
    val byPct = rows.map(r => r.getAs[Int]("pct") -> r).toMap
    assert(byPct(50).getAs[Long]("n_customers") <= byPct(80).getAs[Long]("n_customers"))
    assert(byPct(80).getAs[Long]("n_customers") <= byPct(90).getAs[Long]("n_customers"))
    rows.foreach { r =>
      // the threshold rank is the FIRST to reach the target, so the
      // attained share is >= pct and the share one rank earlier is <
      assert(r.getAs[Double]("rev_share") >= r.getAs[Int]("pct") / 100.0)
      assert(r.getAs[Double]("cust_share") > 0 && r.getAs[Double]("cust_share") <= 1)
    }
  }

  test("return_rate_by_brand: rates bounded, totals conserve the lineitem scan") {
    val rows = graft.operators.Reports.returnRateByBrand(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_lines"))
      val rate = r.getAs[Double]("line_return_rate")
      assert(rate >= 0 && rate <= 1)
    }
    val totLines = rows.map(_.getAs[Long]("n_lines")).sum
    val liCount = graft.core.Tables(spark, sf).lineitem.count()
    assert(totLines == liCount,
      s"brand partition must cover every line: $totLines != $liCount")
  }

  test("cross_price_elasticity: gated transitions only, pair grain is deduped") {
    val rows = graft.operators.Commerce.crossPriceElasticity(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_transitions") >= 3)
      val e = r.getAs[Double]("avg_cross_elasticity")
      // |e| <= gate by construction: |%dq| <= 1 and |%dp| >= 1/gate
      assert(!e.isNaN && math.abs(e) <= 20.0 + 1e-9)
    }
    val pairs = rows.map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b")))
    assert(pairs.distinct.size == pairs.size)
  }

  test("user_event_diversity: bands bounded by the 5-type maximum, users conserved") {
    val rows = graft.operators.Analytics.userEventDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("band")
      // 1 - sum(p^2) over 5 types peaks at 1 - 1/5 = 0.8 -> band <= 80
      assert(b >= 0 && b <= 80)
      val d = r.getAs[Double]("avg_diversity")
      assert(d >= b / 100.0 - 1e-9 && d < (b + 1) / 100.0 + 1e-9)
    }
    val totUsers = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = graft.core.Tables(spark, sf).events
      .select("user_id").distinct().count()
    assert(totUsers == distinctUsers)
  }

  test("link_prediction_resource_alloc: RA bounded by the common count, non-edges only") {
    val ra = graft.operators.Graph.linkPredictionResourceAlloc(spark, sf).collect()
    assert(ra.nonEmpty)
    ra.foreach { r =>
      assert(r.getAs[Long]("node_a") < r.getAs[Long]("node_b"))
      // each wedge contributes 1/deg <= 1, so RA <= common
      assert(r.getAs[Double]("resource_alloc") <= r.getAs[Long]("common") + 1e-9)
      assert(r.getAs[Double]("resource_alloc") > 0)
    }
  }

  test("matryoshka_recall_eval: full-dim arm is the identity, all arms bounded") {
    val rows = graft.operators.Ann.matryoshkaRecallEval(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("trunc_dim")).toSeq == Seq(8, 16, 32, 64))
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_5")
      assert(rec >= 0 && rec <= 1)
    }
    val full = rows.find(_.getAs[Int]("trunc_dim") == 64).get
    assert(full.getAs[Double]("recall_at_5") == 1.0,
      "the 64-dim arm compares the ranking against itself and must be exactly 1")
  }

  test("ivf_cell_occupancy: cells partition the corpus, pair bound is c(c-1)/2") {
    val rows = graft.operators.Ann.ivfCellOccupancy(spark, sf).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n_vectors")).sum
    val n = graft.core.Tables(spark, sf).embeddings.count()
    assert(tot == n, s"cells must partition the corpus: $tot != $n")
    rows.foreach { r =>
      val c = r.getAs[Long]("n_vectors")
      assert(r.getAs[Long]("pair_bound") == c * (c - 1) / 2)
    }
    assert(math.abs(rows.map(_.getAs[Double]("cell_share")).sum - 1.0) < 1e-9)
  }

  test("vocab_coverage_topk: coverage monotone in k, bounded by 1") {
    val rows = graft.operators.TextAnalysis.vocabCoverageTopk(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("top_k")).toSeq == Seq(10, 100, 1000))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      s"coverage must be monotone in k: ${cov.mkString(",")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("covered_tokens") <= r.getAs[Long]("total_tokens"))
    }
  }

  test("heaps_law_curve: prefixes nest, and the full-corpus vocab matches the tf build") {
    val rows = graft.operators.TextAnalysis.heapsLawCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("quartile")).toSeq == Seq(1, 2, 3, 4))
    def mono(f: org.apache.spark.sql.Row => Long) = {
      val v = rows.map(f)
      v.zip(v.tail).forall { case (a, b) => a <= b }
    }
    assert(mono(_.getAs[Long]("n_docs")) && mono(_.getAs[Long]("n_tokens"))
      && mono(_.getAs[Long]("vocab_size")), "prefix counts must nest")
    // the 100% checkpoint's vocab is THE corpus vocabulary — must
    // equal the coverage table's denominator (independently built)
    val fullVocab = rows.last.getAs[Long]("vocab_size")
    val covVocab = graft.operators.TextAnalysis.vocabCoverageTopk(spark, sf)
      .collect().head.getAs[Long]("vocab_size")
    assert(fullVocab == covVocab)
  }

  test("dedup_cluster_size_hist: histogram partitions the corpus, sizes >= 2 in clusters") {
    val rows = graft.operators.Dedup.dedupClusterSizeHist(spark, sf).collect()
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val n = graft.core.Tables(spark, sf).documents.count()
    assert(totDocs == n, s"histogram must partition the corpus: $totDocs != $n")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs")
        == r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
    // multi-doc rows must agree with the cluster labeling's row count
    val clustered = rows.filter(_.getAs[Long]("cluster_size") >= 2)
      .map(_.getAs[Long]("n_docs")).sum
    val labels = graft.operators.Dedup.dedupClusters(spark, sf).count()
    assert(clustered == labels)
  }

  test("anova_twoway: main-effect sums of squares nonnegative, grain conserved") {
    val r = graft.operators.Stats.anovaTwoway(spark, sf).collect().head
    val liCount = graft.core.Tables(spark, sf).lineitem.count()
    assert(r.getAs[Long]("n_lines") == liCount)
    // marginal (main-effect) SS are variance decompositions over a
    // partition and cannot be negative; the Type-I interaction CAN go
    // slightly negative in unbalanced designs, so it is not pinned
    assert(r.getAs[Double]("ss_priority") >= 0)
    assert(r.getAs[Double]("ss_returnflag") >= 0)
    assert(r.getAs[Double]("ss_within") > 0)
    Seq("f_priority", "f_returnflag", "f_interaction").foreach { c =>
      assert(!r.getAs[Double](c).isNaN && !r.getAs[Double](c).isInfinite)
    }
  }

  test("recs_holdout_eval: bounded metrics, recs capped at k per user") {
    val r = graft.operators.Commerce.recsHoldoutEval(spark, sf).collect().head
    val users = r.getAs[Long]("n_users")
    val recs = r.getAs[Long]("n_recs")
    val hits = r.getAs[Long]("n_hits")
    assert(users > 0 && recs > 0)
    assert(recs <= users * r.getAs[Int]("k"), "more than k recs for some user")
    assert(hits <= recs)
    val p = r.getAs[Double]("precision_at_3")
    assert(p >= 0 && p <= 1)
    val rec = r.getAs[Double]("recall_at_3")
    assert(rec >= 0 && rec <= 1)
  }

  test("pq_distortion_eval: full shortlists, abs error dominates the signed gap") {
    val rows = graft.operators.Ann.pqDistortionEval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") > 0)
      val ratio = r.getAs[Double]("adc_to_exact_ratio")
      val mae = r.getAs[Double]("mean_abs_rel_err")
      val over = r.getAs[Double]("overshoot_share")
      assert(ratio > 0)
      // sum|a-e| >= |sum a - sum e| always
      assert(mae >= math.abs(ratio - 1) - 1e-12)
      assert(over >= 0 && over <= 1)
    }
  }

  test("seasonal_decompose: components reassemble the series, residuals center") {
    val rows = graft.operators.Stats.seasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = r.getAs[Double]("revenue")
      val t = r.getAs[Double]("trend")
      val s = r.getAs[Double]("seasonal")
      val e = r.getAs[Double]("residual")
      assert(math.abs(y - (t + s + e)) < 1e-6 * math.max(1.0, math.abs(y)),
        s"additive identity broken: $y != $t + $s + $e")
    }
    // OLS-with-intercept residuals sum to ~0; the seasonal means only
    // redistribute them, so the residual column must center near zero
    // (round-to-6dp noise x months is the only slack)
    val sumRes = rows.map(_.getAs[Double]("residual")).sum
    assert(math.abs(sumRes) < 1.0, s"residuals do not center: $sumRes")
  }

  test("knn_confusion: cells partition the corpus, row shares close to 1") {
    val rows = graft.operators.Ann.knnConfusion(spark, sf).collect()
    val tot = rows.map(_.getAs[Long]("n")).sum
    val n = graft.core.Tables(spark, sf).embeddings.count()
    assert(tot == n, s"every vector must classify exactly once: $tot != $n")
    rows.groupBy(_.getAs[Int]("actual_label")).foreach { case (lbl, cells) =>
      val s = cells.map(_.getAs[Double]("row_share")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"label $lbl shares sum to $s")
    }
  }

  test("price_point_profile: band ordering and bounded modal share") {
    val rows = graft.operators.Reports.pricePointProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_price_points") <= r.getAs[Long]("n_parts"))
      val (lo, md, hi) = (r.getAs[Double]("min_price"),
        r.getAs[Double]("modal_price"), r.getAs[Double]("max_price"))
      assert(lo <= md && md <= hi, s"modal outside band: $lo $md $hi")
      val share = r.getAs[Double]("modal_share")
      assert(share > 0 && share <= 1)
    }
  }

  test("term_drift_by_source: TV bounded, token mass conserved") {
    val rows = graft.operators.TextAnalysis.termDriftBySource(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_distance")
      assert(tv >= 0 && tv <= 1, s"TV out of range: $tv")
    }
    val srcTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val corpusTokens = graft.operators.TextAnalysis.vocabCoverageTopk(spark, sf)
      .collect().head.getAs[Long]("total_tokens")
    assert(srcTokens == corpusTokens,
      s"source token mass must equal the corpus total: $srcTokens != $corpusTokens")
  }

  test("label_separation_profile: corpus partition and the 2^53 distance ledger") {
    val rows = graft.operators.Ann.labelSeparationProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(tot == graft.core.Tables(spark, sf).embeddings.count())
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_intra_d2") > 0)
      assert(r.getAs[Long]("min_inter_d2") >= 0)
      assert(r.getAs[Double]("separation_ratio") >= 0)
      // the decimal->double cast bound the Scaladoc claims: the label
      // distance sum must stay an exactly-castable integer
      val sd2 = r.getAs[Double]("mean_intra_d2") * r.getAs[Long]("n_vectors")
      assert(sd2 < math.pow(2, 53), s"intra sum crosses the cast ledger: $sd2")
    }
  }

  test("quality_pass_by_source: reasons partition each source's docs") {
    val rows = graft.operators.TextAnalysis.qualityPassBySource(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[Long]("n_kept") + r.getAs[Long]("n_too_short") +
        r.getAs[Long]("n_repetitive") + r.getAs[Long]("n_low_stopword")
      assert(parts == r.getAs[Long]("n_docs"),
        s"reasons must partition: $parts != ${r.getAs[Long]("n_docs")}")
      val pr = r.getAs[Double]("pass_rate")
      assert(pr >= 0 && pr <= 1)
    }
    val tot = rows.map(_.getAs[Long]("n_docs")).sum
    assert(tot == graft.core.Tables(spark, sf).documents.count())
  }

  test("markov_absorption: probabilities monotone in steps and bounded") {
    val rows = graft.operators.Stats.markovAbsorption(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val ps = (1 to 4).map(k => r.getAs[Double](s"p_absorb_$k"))
      ps.foreach(p => assert(p >= 0 && p <= 1, s"absorption out of range: $p"))
      // adding a step can only add absorption paths
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-12, s"absorption must be monotone in k: $a -> $b") }
    }
  }

  test("srm_check: variants partition the users, flag matches the statistic") {
    val r = graft.operators.Commerce.srmCheck(spark, sf).collect().head
    val users = graft.core.Tables(spark, sf).events.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0)
    assert(r.getAs[Int]("srm_flag") == (if (chi2 > 3.841) 1 else 0))
  }

  test("scd2_conformance: healthy build reports zero violations, grain matches history") {
    val r = graft.etl.QualityChecks.scd2Conformance(spark, sf).collect().head
    val hist = graft.etl.StarSchema.scd2History(spark, sf)
    assert(r.getAs[Long]("n_rows") == hist.count())
    assert(r.getAs[Long]("n_keys") ==
      hist.select("customer_source_id").distinct().count())
    Seq("open_row_violations", "overlap_violations", "gap_violations",
        "version_density_violations").foreach { c =>
      assert(r.getAs[Long](c) == 0L, s"$c must be zero on the published history")
    }
  }

  test("community_louvain single-task and distributed branches agree exactly") {
    // the layout-selected local replay (added after the sf0.1 driver
    // bench showed ~4.5 s/round of pure stage latency on a 3.5k-edge
    // graph) must be bit-identical to the distributed merge rounds
    val local = graft.operators.Graph.communityLouvain(spark, sf).collect().head
    val dist = graft.operators.Graph
      .communityLouvain(spark, sf, forceDistributed = true).collect().head
    assert(local == dist, s"branches diverged:\n local=$local\n dist=$dist")
  }

  test("partition_freshness: newest partition has zero lag, volumes conserve") {
    val fr = graft.etl.QualityChecks.partitionFreshness(spark, sf).collect()
    assert(fr.nonEmpty)
    assert(fr.map(_.getAs[Int]("lag_days")).min == 0)
    val tot = fr.map(_.getAs[Long]("n_events")).sum
    val n = graft.core.Tables(spark, sf).events.count()
    assert(tot == n)
    // days are ISO strings and unique (a real partition key)
    val days = fr.map(_.getAs[String]("day"))
    assert(days.distinct.length == days.length)
    assert(days.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
  }
}
