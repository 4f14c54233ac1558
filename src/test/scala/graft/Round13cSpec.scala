package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 continuation pins for the second operator wave (MRR/ROC
  * evals, newsvendor, WoE/IV, quadratic + Granger fits, Gumbel,
  * Mahalanobis, RBO, readability, shingle-size sweep, hub closeness,
  * basket significance): each test pins the mathematical invariant
  * the oracle hash can't see — the hash proves Spark == DuckDB, these
  * prove both engines compute the STATISTIC claimed.
  */
class Round13cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("ann_mrr_eval: rr is 1/first rank, pooled mrr is the mean") {
    val r = rows("ann_mrr_eval")
    assert(r.nonEmpty)
    var sum = 0.0
    r.foreach { row =>
      val fr = row.getAs[Long]("first_rel_rank")
      val rr = row.getAs[Double]("reciprocal_rank")
      if (fr == 0L) assert(rr == 0.0)
      else assert(math.abs(rr - 1.0 / fr) < 1e-12)
      assert(rr >= 0.0 && rr <= 1.0)
      sum += rr
    }
    val mrr = r.head.getAs[Double]("mrr")
    assert(math.abs(mrr - sum / r.length) < 1e-6)
  }

  test("roc_curve_points: cumulative rates reach (1,1) at the lowest band") {
    val r = rows("roc_curve_points")
    assert(r.nonEmpty)
    r.foreach { row =>
      val tpr = row.getAs[Double]("tpr")
      val fpr = row.getAs[Double]("fpr")
      assert(tpr >= 0.0 && tpr <= 1.0 && fpr >= 0.0 && fpr <= 1.0)
    }
    val bottom = r.minBy(_.getAs[Long]("band"))
    assert(bottom.getAs[Double]("tpr") == 1.0)
    assert(bottom.getAs[Double]("fpr") == 1.0)
  }

  test("newsvendor_stock: the 0.8-quantile stock covers >= 80% of weeks") {
    val r = rows("newsvendor_stock")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("service_level") >= 0.8 - 1e-12)
      assert(row.getAs[Long]("p50_demand") <= row.getAs[Long]("stock_level"))
    }
  }

  test("woe_iv_profile: IV nonnegative, smoothed shares sum to 1") {
    val r = rows("woe_iv_profile")
    assert(r.nonEmpty)
    assert(r.head.getAs[Double]("iv_total") >= 0.0)
    val sg = r.map(_.getAs[Double]("dist_good")).sum
    val sb = r.map(_.getAs[Double]("dist_bad")).sum
    assert(math.abs(sg - 1.0) < 1e-9 && math.abs(sb - 1.0) < 1e-9)
    r.foreach { row =>
      // per-row IV contribution is (pg-pb)·ln(pg/pb) >= 0 always
      assert(row.getAs[Double]("iv_contrib") >= -1e-12)
    }
  }

  test("quadratic_trend: R^2 in range and vertex finite") {
    val r = rows("quadratic_trend")
    assert(r.length == 1)
    val r2 = r.head.getAs[Double]("r2")
    assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-12)
    assert(!r.head.getAs[Double]("vertex_month").isNaN)
  }

  test("granger_lag1: unrestricted RSS never exceeds restricted, F >= 0") {
    val r = rows("granger_lag1")
    assert(r.length == 2)
    r.foreach { row =>
      val rssR = row.getAs[Double]("rss_restricted")
      val rssU = row.getAs[Double]("rss_unrestricted")
      assert(rssU <= rssR + math.abs(rssR) * 1e-9 + 1e-6,
        s"adding a regressor cannot increase RSS: $rssU > $rssR")
      assert(row.getAs[Double]("f_stat") >= 0.0)
    }
  }

  test("gumbel_extreme_fit: scale nonnegative, return levels monotone in T") {
    val r = rows("gumbel_extreme_fit")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Double]("scale") >= 0.0)
    val (l12, l60, l120) = (row.getAs[Double]("return_level_12"),
      row.getAs[Double]("return_level_60"), row.getAs[Double]("return_level_120"))
    assert(l12 <= l60 && l60 <= l120)
    val p = row.getAs[Double]("prob_exceed_max")
    assert(p >= 0.0 && p <= 1.0)
  }

  test("mahalanobis_outliers: top-k sorted by nonnegative d2") {
    val r = rows("mahalanobis_outliers")
    assert(r.nonEmpty && r.length <= 20)
    val d2s = r.map(_.getAs[Double]("d2"))
    assert(d2s.forall(_ >= 0.0))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b })
  }

  test("rank_biased_overlap: rbo in [0,1] and equals the term sum") {
    val r = rows("rank_biased_overlap")
    assert(r.length == 10)
    val rbo = r.head.getAs[Double]("rbo_at_10")
    assert(rbo >= 0.0 && rbo <= 1.0)
    val termSum = r.map(_.getAs[Double]("term")).sum
    assert(math.abs(rbo - termSum) < 1e-6)
    r.foreach { row =>
      val a = row.getAs[Double]("agreement")
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  test("readability_profile: ratios well-formed") {
    val r = rows("readability_profile")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("syllables_per_word") > 0.0)
      val pc = row.getAs[Double]("pct_complex")
      assert(pc >= 0.0 && pc <= 1.0)
    }
  }

  test("dedup_shingle_size_sensitivity: candidate set fixed across sizes") {
    val r = rows("dedup_shingle_size_sensitivity")
    assert(r.length == 3)
    val cands = r.map(_.getAs[Long]("n_cand")).distinct
    assert(cands.length == 1, s"candidates must not vary with shingle size: $cands")
    r.foreach { row =>
      assert(row.getAs[Long]("n_pass") <= row.getAs[Long]("n_cand"))
      val mj = row.getAs[Double]("mean_jaccard")
      assert(mj >= 0.0 && mj <= 1.0)
    }
  }

  test("hub_closeness_profile: 1-hop reach equals degree, closeness decomposes") {
    val r = rows("hub_closeness_profile")
    assert(r.nonEmpty && r.length <= 5)
    r.foreach { row =>
      assert(row.getAs[Long]("n_hop1") == row.getAs[Long]("degree"),
        "in a simple symmetric graph the 1-hop reach IS the degree")
      val hc = row.getAs[Double]("harmonic_closeness")
      val expect = row.getAs[Long]("n_hop1") + row.getAs[Long]("n_hop2") / 2.0 +
        row.getAs[Long]("n_hop3") / 3.0
      assert(math.abs(hc - expect) < 1e-6)
    }
  }

  test("basket_lift_significance: chi2 is z^2 and expected positive") {
    val r = rows("basket_lift_significance")
    assert(r.length <= 20)
    r.foreach { row =>
      val z = row.getAs[Double]("z_score")
      assert(math.abs(row.getAs[Double]("chi2") - z * z) < 1e-9)
      assert(row.getAs[Double]("expected") > 0.0)
    }
  }

  test("pr_auc_eval: recall cumulative from the top, AP in [0,1]") {
    val r = rows("pr_auc_eval").sortBy(-_.getAs[Long]("band"))
    assert(r.nonEmpty)
    val recalls = r.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-12 },
      "recall must be nondecreasing as the threshold drops")
    val ap = r.head.getAs[Double]("average_precision")
    assert(ap >= 0.0 && ap <= 1.0 + 1e-9)
  }

  test("effect_size_regions: d sign matches the mean difference, |g| <= |d|") {
    val r = rows("effect_size_regions")
    assert(r.length == 10, "5 regions -> 10 unordered pairs")
    r.foreach { row =>
      val d = row.getAs[Double]("cohens_d")
      val g = row.getAs[Double]("hedges_g")
      val dm = row.getAs[Double]("mean_a") - row.getAs[Double]("mean_b")
      assert(d * dm >= 0.0, "d must carry the sign of the mean difference")
      assert(math.abs(g) <= math.abs(d) + 1e-12, "the bias correction shrinks")
    }
  }

  test("retention_decay_fit: well-formed fit") {
    val r = rows("retention_decay_fit")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_points") >= 2)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    assert(row.getAs[Double]("half_life_years") >= 0.0)
  }

  test("source_divergence_matrix: full pair grid, JS within [0, ln 2]") {
    val r = rows("source_divergence_matrix")
    val nSources = SparkEntry.queries("readability_profile")(spark, sf).count()
    assert(r.length == (nSources * (nSources - 1) / 2).toInt)
    r.foreach { row =>
      val js = row.getAs[Double]("js_divergence")
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9,
        s"JS out of [0, ln2]: $js")
      assert(row.getAs[Long]("n_shared_words") <= row.getAs[Long]("n_union_words"))
    }
  }
}
