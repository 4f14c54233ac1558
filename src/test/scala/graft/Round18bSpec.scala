package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 second-wave behavior pins for the new query batch —
  * mathematical invariants and cross-operator identities the
  * DuckDB hash gate cannot see.
  */
class Round18bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Stats = graft.operators.Stats
  private val Text = graft.operators.TextAnalysis
  private val Ann = graft.operators.Ann
  private val Analytics = graft.operators.Analytics

  test("lepage_test: z_wilcoxon sign agrees with cliff_delta's direction on clear shifts") {
    val lp = Stats.lepageTest(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("z_wilcoxon"))).toMap
    graft.core.OwnedCaches.release()
    val cd = Stats.cliffDelta(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Double]("delta"))).toMap
    graft.core.OwnedCaches.release()
    // z_W sums type-a's combined midranks: a sitting HIGHER (delta>0)
    // must push z_W positive — both are monotone in the same U with
    // the same midrank tie convention, so sign agreement is exact for
    // ANY nonzero delta (sf0.01's synthetic types shift only slightly)
    val checked = cd.filter { case (_, d) => math.abs(d) > 1e-9 }
    assert(checked.nonEmpty)
    checked.foreach { case (pair, d) =>
      assert(lp(pair) * d > 0, s"$pair: z_wilcoxon=${lp(pair)} vs delta=$d")
    }
    lp.values.foreach(z => assert(!z.isNaN && !z.isInfinite))
  }

  test("tost_equivalence: an equivalence verdict implies the diff sits inside the margin") {
    val rows = Stats.tostEquivalence(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == 10)
    rows.foreach { r =>
      val d = r.getAs[Double]("mean_diff"); val m = r.getAs[Double]("margin")
      if (r.getAs[Int]("equivalent") == 1)
        assert(math.abs(d) < m, s"equivalent pair with |diff| >= margin: $r")
      assert(r.getAs[Double]("t_lower") >= r.getAs[Double]("t_upper") - 1e-12 ||
        m == 0.0, "t_lower >= t_upper whenever margin >= 0")
    }
  }

  test("white_test: auxiliary R-squared is a valid share") {
    val r = Stats.whiteTest(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val r2 = r.getAs[Double]("r2_aux")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    assert(r.getAs[Double]("white_stat") >= 0.0)
  }

  test("ordinal_gamma_somers: |gamma| >= |somers_d| >= |tau_b| (denominator ordering)") {
    val r = Stats.ordinalGammaSomers(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val g = r.getAs[Double]("gamma"); val s = r.getAs[Double]("somers_d")
    val t = r.getAs[Double]("tau_b")
    // C+Q <= n0 - Tx and n0 - Tx <= sqrt((n0-Tx)(n0-Ty)) iff
    // n0-Tx <= n0-Ty; pin the always-true outer bound and the
    // geometric-mean bound
    assert(math.abs(g) >= math.abs(s) - 1e-12)
    assert(math.abs(g) >= math.abs(t) - 1e-12)
    assert(r.getAs[Long]("concordant") >= 0 && r.getAs[Long]("discordant") >= 0)
  }

  test("good_turing_estimate: p0 is a probability, spectra are consistent") {
    val rows = Text.goodTuringEstimate(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p0 = r.getAs[Double]("p0_unseen")
      assert(p0 >= 0.0 && p0 <= 1.0)
      assert(r.getAs[Double]("r_star") >= 0.0)
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("dunning_g2_keywords: top keyword per source is overused there (positive signed G2)") {
    val rows = Text.dunningG2Keywords(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    val top = rows.filter(_.getAs[Long]("rk") == 1L)
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Double]("g2") >= 0.0,
        s"rank-1 keyword must be overused: $r")
      assert(r.getAs[Long]("tf_source") <= r.getAs[Long]("tf_corpus"))
    }
  }

  test("yule_simpson_diversity: D in [0,1], K nonnegative, singleton-free floor holds") {
    val rows = Text.yuleSimpsonDiversity(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    rows.foreach { r =>
      val d = r.getAs[Double]("simpson_d")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[Double]("yule_k") >= 0.0)
    }
  }

  test("session_gap_sensitivity: sessions merge monotonically as the gap widens") {
    val rows = Analytics.sessionGapSensitivity(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == 4)
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "a wider idle gap can only merge sessions, never split them")
    val dwell = rows.map(_.getAs[Double]("mean_session_dwell_s"))
    assert(dwell.zip(dwell.tail).forall { case (a, b) => a <= b },
      "mean in-session dwell grows with the gap")
  }

  test("ann_probe_width_curve: recall is non-decreasing in width and hits the production point") {
    val rows = Ann.annProbeWidthCurve(spark, sf01).collect()
    graft.core.OwnedCaches.release()
    assert(rows.length == 4)
    val rec = rows.map(_.getAs[Double]("recall"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      "coverage recall is monotone in probe width")
    assert(rec.last > 0.0)
  }

  test("dixon_q_test: ratios are valid shares of the range") {
    val r = Stats.dixonQTest(spark, sf01).collect()(0)
    graft.core.OwnedCaches.release()
    val ql = r.getAs[Double]("q_low"); val qh = r.getAs[Double]("q_high")
    assert(ql >= 0.0 && ql <= 1.0 && qh >= 0.0 && qh <= 1.0)
    assert(r.getAs[Long]("y_max") >= r.getAs[Long]("y_min"))
  }
}
