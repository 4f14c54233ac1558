package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 ninth-wave pins (Tukey HSD, Moran's I, Kendall's W,
  * Brier decomposition). */
class Round13jSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("tukey_hsd: 10 pairs, q consistent with anova MSW, flag matches q_crit") {
    val r = rows("tukey_hsd")
    assert(r.length == 10, "C(5,2) event-type pairs")
    r.foreach { row =>
      val q = row.getAs[Double]("q_stat")
      val sig = row.getAs[Int]("significant")
      assert(q >= 0.0)
      assert(sig == (if (q > 3.858) 1 else 0),
        s"flag must be q > 3.858: q=$q sig=$sig")
      val md = row.getAs[Double]("mean_diff")
      val ma = row.getAs[Double]("mean_a"); val mb = row.getAs[Double]("mean_b")
      assert(math.abs(md - (ma - mb)) < 1e-9)
      // q = |diff| / se on the dollar-scaled columns too (cents cancel)
      val se = row.getAs[Double]("se")
      assert(math.abs(q - math.abs(md) / se) < 1e-6 * (1.0 + q))
    }
  }

  test("tukey_hsd: pair SE^2 between the two one-sample variances' scale" +
    " (MSW sanity against anova_oneway's SSW)") {
    val anova = rows("anova_oneway").head
    val ssw = anova.getAs[Double]("ssw") // dollars²
    val n = anova.getAs[Long]("n_events")
    val msw = ssw / (n - 5).toDouble
    val r = rows("tukey_hsd")
    // rebuild each pair's SE from anova's MSW and the pair's implied n
    // via se² = msw/2·(1/n_i + 1/n_j): check one invariant that needs
    // no per-type counts — the smallest possible SE is bounded below
    // by sqrt(msw/2 · 2/max_n) with max_n < n
    r.foreach { row =>
      val se = row.getAs[Double]("se")
      assert(se * se > msw / n.toDouble,
        s"se²=${se * se} must exceed msw/n=${msw / n}")
    }
  }

  test("moran_i: expected value -1/(n-1), dims fixed, driver recompute") {
    val r = rows("moran_i").head
    assert(r.getAs[Long]("n_nations") == 25L)
    assert(r.getAs[Long]("n_regions") == 5L)
    assert(math.abs(r.getAs[Double]("expected_i") - (-1.0 / 24.0)) < 1e-12)
    // driver-side recompute from nation revenue
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val rev = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2)) * 100")).as("cents"))
      .collect().map(x => x.getAs[Int]("c_nationkey") ->
        x.getAs[java.math.BigDecimal]("cents").longValueExact()).toMap
    val regions = t.nation.select("n_nationkey", "n_regionkey").collect()
      .map(x => x.getInt(0) -> x.getInt(1))
    val n = regions.length
    val xs = regions.map { case (nk, rk) => (rk, rev.getOrElse(nk, 0L)) }
    val mean = xs.map(_._2).sum.toDouble / n
    val z = xs.map { case (rk, v) => (rk, v - mean) }
    val s0 = z.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1)).sum
    val num = z.groupBy(_._1).values.map { g =>
      val u = g.map(_._2).sum; u * u - g.map(v => v._2 * v._2).sum
    }.sum
    val den = z.map(v => v._2 * v._2).sum
    val expect = n.toDouble / s0 * (num / den)
    assert(math.abs(r.getAs[Double]("moran_i") - expect) < 1e-9,
      s"got ${r.getAs[Double]("moran_i")} recomputed $expect")
  }

  test("kendalls_w: W in [0,1], chi2 identity, complete 25-brand blocks") {
    val r = rows("kendalls_w").head
    val w = r.getAs[Double]("w")
    val b = r.getAs[Long]("n_blocks"); val k = r.getAs[Long]("k_items")
    assert(k == 25L)
    assert(b > 0L)
    assert(w >= 0.0 && w <= 1.0, s"W=$w out of range")
    val chi2 = r.getAs[Double]("chi2_f")
    assert(math.abs(chi2 - b * (k - 1) * w) < 1e-9 * (1.0 + chi2))
    // monthly revenue rankings across 6+ years should NOT be random
    // noise (brands have distinct price mass) nor perfectly rigid
    assert(w > 0.0 && w < 1.0)
  }

  test("brier_decomposition: exact Murphy identity and calibration_curve agreement") {
    val r = rows("brier_decomposition").head
    val bs = r.getAs[Double]("brier_score")
    val unc = r.getAs[Double]("uncertainty")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val wbv = r.getAs[Double]("within_bin_var")
    val wcv = r.getAs[Double]("within_bin_cov")
    assert(bs >= 0.0 && bs <= 1.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-12)
    assert(rel >= 0.0 && res >= 0.0 && wbv >= -1e-12)
    // the 5-term identity is exact up to the 9-dp quantized sums
    val recon = unc + rel - res + wbv - 2.0 * wcv
    assert(math.abs(bs - recon) < 1e-6,
      s"BS=$bs must reconstruct from UNC+REL-RES+WBV-2WCV=$recon")
    // same Brier as calibration_curve publishes
    val cal = rows("calibration_curve")
    val calBs = cal.head.getAs[Double]("brier_score")
    assert(math.abs(bs - calBs) < 1e-9)
  }
}
