package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 behavior pins for the eight new operators — each checks
  * a property the DuckDB hash gate CANNOT see (the oracle proves the
  * two engines agree; these prove the agreed-on answer means what the
  * Scaladoc claims).
  */
class Round16bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Stats = graft.operators.Stats
  private val Graph = graft.operators.Graph
  private val Ann = graft.operators.Ann
  private val Text = graft.operators.TextAnalysis

  test("wilcoxon_signed_rank: rank-sum identity W+ + W- = n(n+1)/2, z finite") {
    val r = Stats.wilcoxonSignedRank(spark, sf01).collect()(0)
    val n = r.getAs[Long]("n_pairs")
    val wp = r.getAs[Double]("w_plus"); val wm = r.getAs[Double]("w_minus")
    assert(n > 10, "daily pairs must populate")
    assert(math.abs(wp + wm - n.toDouble * (n + 1) / 2) < 1e-6,
      "positive and negative rank sums must partition the total rank mass")
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("kuiper_test: V = D+ + D-, V >= KS D, both one-sided stats in [0,1]") {
    val kp = Stats.kuiperTest(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("d_plus"), r.getAs[Double]("d_minus"), r.getAs[Double]("v_stat"))).toMap
    val ks = Stats.ksTest(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("d_stat")).toMap
    assert(kp.size == 10)
    kp.foreach { case (pair, (dp, dm, v)) =>
      assert(dp >= 0 && dp <= 1 && dm >= 0 && dm <= 1, s"$pair one-sided sup-norms in range")
      assert(math.abs(v - (dp + dm)) == 0.0, s"$pair V is the exact sum")
      // sup|F-G| = max(D+, D-) <= D+ + D- = V, and V >= KS by definition
      assert(v >= ks(pair) - 1e-15, s"$pair Kuiper V must dominate the KS sup-norm")
    }
  }

  test("breusch_pagan: LM nonnegative, slope matches regression_trend's fit") {
    val bp = Stats.breuschPagan(spark, sf01).collect()(0)
    val rt = Stats.regressionTrend(spark, sf01).collect()(0)
    assert(bp.getAs[Double]("bp_stat") >= 0.0)
    // regression_trend reports currency/day (cents fit / 100); the BP
    // fit stays in cents — same fit, unit apart
    assert(math.abs(bp.getAs[Double]("slope") / 100.0 - rt.getAs[Double]("slope"))
      <= 1e-12 * math.abs(rt.getAs[Double]("slope")),
      "the primary fit must be regression_trend's fit up to the unit factor")
    assert(bp.getAs[Long]("n_days") > 100)
  }

  test("katz_topk: scores exceed the base mass, descend, and respect degree dominance") {
    val rows = Graph.katzTopk(spark, sf01).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Long]("katz_q6"))
    assert(scores.forall(_ > 1000000L), "every surviving score carries walk mass beyond β")
    assert(scores.sameElements(scores.sortBy(-_)), "top-k must descend")
  }

  test("ann_range_search: agrees with brute-force top-k where both see the same neighbors") {
    val rs = Ann.annRangeSearch(spark, sf01).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(rs.size == 10, "every panel anchor reported, including empty radii")
    rs.values.foreach { r =>
      val n = r.getAs[Long]("n_in_range")
      if (n > 0) {
        val mx = r.getAs[Long]("max_sim_q12"); val mn = r.getAs[Long]("min_sim_q12")
        assert(mx >= mn && mn >= (0.45 * 1e12 - 1).toLong, "extrema ordered and above tau")
      } else assert(r.isNullAt(r.fieldIndex("max_sim_q12")))
    }
    // the nearest in-range neighbor must sit in the brute-force top-3:
    // range search ranks q6-floored cosines while brute-force ranks
    // raw unit-dot floats, so exact rank-1 equality can flip on
    // near-ties within the ~1e-6 quantization band — membership in
    // the head is the quantization-robust consistency claim
    val bf = Ann.annTopkBruteforce(spark, sf01)
      .filter(col("rank") <= 3).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    rs.values.filter(_.getAs[Long]("n_in_range") > 0).foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(bf(q).contains(r.getAs[Long]("nearest_id")),
        s"anchor $q: radius-search nearest must sit in the brute-force top-3")
    }
  }

  test("importance_resample: target-source docs score higher on average than raw") {
    val df = Text.importanceResample(spark, sf01)
      .filter(col("n_vocab_toks") > 0)
    val tgt = Seq("src0", "src1", "src2", "src3")
    val m = df.groupBy(col("source").isin(tgt: _*).as("is_tgt"))
      .agg(avg(col("weight")).as("w"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> (r.getAs[Double]("w"), r.getLong(2))).toMap
    assert(m(true)._2 > 0 && m(false)._2 > 0)
    assert(m(true)._1 > m(false)._1,
      "the importance LM must upweight the domain it was fit to — " +
        s"target mean ${m(true)._1} vs raw mean ${m(false)._1}")
    // admit boundary is the exact sum sign, never a float threshold
    val bad = df.filter((col("weight") > 0) =!= col("admit")).count()
    assert(bad == 0, "admit must equal weight > 0 on every doc with vocab tokens")
  }

  test("quality_logreg_filter: distillation beats the untrained AND the best-constant baseline, admits separate") {
    val rows = Text.qualityLogregFilter(spark, sf01).collect()
    assert(rows.length > 400)
    val n = rows.length.toDouble
    val loss = rows.map { r =>
      val y = r.getAs[Double]("label_kept"); val z = r.getAs[Double]("logit")
      math.log1p(math.exp(-z)) + (1.0 - y) * z // -y ln sig(z) - (1-y) ln(1-sig(z))
    }.sum / n
    // untrained (w=0) loss = ln 2; best CONSTANT predictor loss =
    // H(base rate) -- beating the latter proves the features carry
    // signal, not just the intercept
    val pbar = rows.map(_.getAs[Double]("label_kept")).sum / n
    val hBase = -(pbar * math.log(pbar) + (1 - pbar) * math.log(1 - pbar))
    assert(loss < math.log(2.0), s"must beat the untrained ln2 baseline, got $loss")
    assert(loss < hBase, s"must beat the best-constant baseline $hBase, got $loss")
    val keptAdmit = rows.filter(_.getAs[Double]("label_kept") == 1.0)
      .count(_.getAs[Boolean]("admit")).toDouble /
      rows.count(_.getAs[Double]("label_kept") == 1.0)
    val rejAdmit = rows.filter(_.getAs[Double]("label_kept") == 0.0)
      .count(_.getAs[Boolean]("admit")).toDouble /
      math.max(1, rows.count(_.getAs[Double]("label_kept") == 0.0))
    assert(keptAdmit > rejAdmit,
      s"the distilled filter must admit rule-kept docs at a higher rate ($keptAdmit vs $rejAdmit)")
    // distillation sanity vs the teacher itself
    val agree = rows.count(r =>
      (r.getAs[Double]("label_kept") == 1.0) == r.getAs[Boolean]("admit")) / n
    assert(agree > 0.5, s"student-teacher agreement must beat coin flip, got $agree")
  }

  test("turning_point_test: count bounded by interior days, expectation exact, z finite") {
    val r = Stats.turningPointTest(spark, sf01).collect()(0)
    val n = r.getAs[Long]("n_days"); val t = r.getAs[Long]("n_turning")
    assert(t >= 0 && t <= n - 2, "only interior days can turn")
    assert(math.abs(r.getAs[Double]("expected") - 2.0 * (n - 2) / 3.0) < 1e-9)
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("max_drawdown: nonnegative, peak dominates trough, share in [0,1)") {
    val r = Stats.maxDrawdown(spark, sf01).collect()(0)
    val dd = r.getAs[Long]("max_dd_cents"); val pk = r.getAs[Long]("peak_cents")
    assert(dd >= 0 && pk >= dd, "drawdown is peak minus trough, peak >= drawdown")
    val share = r.getAs[Double]("dd_share")
    assert(share >= 0.0 && share < 1.0, "revenue never goes negative, so share < 1")
    assert(r.getAs[String]("trough_date").matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("record_highs_test: at least the first record, harmonic expectation in the ln-n window") {
    val r = Stats.recordHighsTest(spark, sf01).collect()(0)
    val n = r.getAs[Long]("n_days"); val t = r.getAs[Long]("n_records")
    assert(t >= 1 && t <= n)
    val e = r.getAs[Double]("expected")
    // H_n = ln n + gamma + o(1)
    assert(e > math.log(n.toDouble) && e < math.log(n.toDouble) + 1.0,
      s"harmonic expectation $e must sit just above ln($n)")
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("hurst_exponent: one shared slope, R/S grows with block size, H in a sane band") {
    val rows = Stats.hurstExponent(spark, sf01).collect()
    assert(rows.length == 4)
    val hs = rows.map(_.getAs[Double]("hurst")).distinct
    assert(hs.length == 1, "the log-log slope is a single shared statistic")
    assert(hs(0) > 0.0 && hs(0) < 1.5, s"H=${hs(0)} must be a plausible exponent")
    val rs = rows.sortBy(_.getAs[Int]("block_size")).map(_.getAs[Double]("mean_rs"))
    assert(rs.sameElements(rs.sorted), "mean R/S must be nondecreasing in block size")
    rows.foreach(r => assert(r.getAs[Long]("n_blocks") >= 4,
      "every size on the grid must have enough full blocks to mean over"))
  }

  test("quality_logreg_eval: recall monotone nonincreasing in threshold, cells partition the corpus") {
    val rows = Text.qualityLogregEval(spark, sf01).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == 5)
    val totals = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn")).distinct
    assert(totals.length == 1, "every operating point sees the same corpus")
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      "raising the admit threshold can only lose true positives")
    val admits = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    assert(admits.zip(admits.tail).forall { case (a, b) => a >= b },
      "admitted volume is monotone in the threshold")
  }

  test("dp mechanism: noise is reproducible, zero-mean-ish, and never degenerate;" +
      " the release projects it away") {
    // the audit face carries the raw count and noise (round 17 split)
    val rows = graft.etl.QualityChecks.dpReleaseAudit(spark, sf01).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val noise = r.getAs[Double]("noise")
      assert(!noise.isNaN && !noise.isInfinite, "ln argument must stay positive")
      assert(math.abs(r.getAs[Double]("noisy_count") -
        (r.getAs[Long]("n_docs") + noise)) == 0.0)
    }
    // Laplace(1) has ~50/50 sign split; 20 seeded draws shouldn't all agree
    val pos = rows.count(_.getAs[Double]("noise") > 0)
    assert(pos > 0 && pos < 20, "seeded noise must carry both signs across sources")
    // determinism: a second run reproduces the audit bit for bit
    val again = graft.etl.QualityChecks.dpReleaseAudit(spark, sf01).collect()
      .map(_.getAs[Double]("noise"))
    assert(rows.map(_.getAs[Double]("noise")).sameElements(again))
    // the RELEASE face must expose neither the raw count nor the noise
    val rel = graft.etl.QualityChecks.dpNoisyCounts(spark, sf01)
    assert(rel.columns.sorted.sameElements(Array("epsilon", "noisy_count", "source")))
  }
}
