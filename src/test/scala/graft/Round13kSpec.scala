package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 tenth-wave pins (KS+BH FDR battery, theta forecast,
  * Simpson audit, seasonal strength). */
class Round13kSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("ks_fdr_battery: 25 tests, BH step-up recompute, p from D recompute") {
    val r = rows("ks_fdr_battery")
    assert(r.length == 25)
    val ranks = r.map(_.getAs[Int]("bh_rank")).sorted
    assert(ranks.sameElements(1 to 25), "bh_rank must be a permutation")
    // p-value recomputes from D and the counts via the one-term
    // asymptotic (driver-side libm exp vs engine ExactExp: ≤3e-15 rel)
    val nt = r.map(_.getAs[Long]("n_brand")).sum
    r.foreach { row =>
      val nb = row.getAs[Long]("n_brand"); val d = row.getAs[Double]("d_stat")
      val ne = nb.toDouble * (nt - nb) / nt
      val p = math.min(1.0, 2.0 * math.exp(math.max(-40.0, -2.0 * ne * d * d)))
      val got = row.getAs[Double]("p_value")
      assert(math.abs(got - p) < 1e-12 * (1.0 + p), s"${row.getString(0)}: $got vs $p")
    }
    // BH rule: reject exactly ranks <= max{i : p_(i) <= i*alpha/m}
    val byRank = r.sortBy(_.getAs[Int]("bh_rank"))
    val crossing = byRank.filter(row =>
      row.getAs[Double]("p_value") <= row.getAs[Int]("bh_rank") * 0.05 / 25.0)
      .map(_.getAs[Int]("bh_rank")).foldLeft(0)(math.max)
    byRank.foreach { row =>
      val expect = if (row.getAs[Int]("bh_rank") <= crossing) 1 else 0
      assert(row.getAs[Int]("rejected") == expect)
    }
  }

  test("theta_forecast: theta = SES + slope/2 identity, 5 regions") {
    val r = rows("theta_forecast")
    assert(r.length == 5)
    r.foreach { row =>
      val ses = row.getAs[Double]("ses_level")
      val b = row.getAs[Double]("ols_slope_monthly")
      val th = row.getAs[Double]("theta_forecast")
      assert(math.abs(th - (ses + b / 2.0)) < 1e-9 * (1.0 + math.abs(th)))
      assert(row.getAs[Long]("n_months") >= 12L, "full EWMA window must exist")
    }
    // a positive-slope region forecasts above its SES level, a
    // negative-slope one below (drift direction is the theta point)
    r.foreach { row =>
      val b = row.getAs[Double]("ols_slope_monthly")
      val diff = row.getAs[Double]("theta_forecast") - row.getAs[Double]("ses_level")
      assert(diff * b >= 0.0)
    }
  }

  test("simpson_paradox_audit: pooled slope identical on all rows and " +
    "equal to the moment-sum recompute; flags consistent") {
    val r = rows("simpson_paradox_audit")
    assert(r.length == 25)
    val pooled = r.map(_.getAs[Double]("pooled_slope")).distinct
    assert(pooled.length == 1, "pooled slope must be a single value")
    r.foreach { row =>
      val flip = row.getAs[Int]("sign_flip")
      val prod = row.getAs[Double]("brand_slope") * pooled.head
      assert(flip == (if (prod < 0) 1 else 0))
    }
    // recompute pooled slope from raw moments
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val m = t.lineitem.select(
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"), sum(col("q")).as("sq"),
        sum(expr("d * q")).as("sdq"), sum(expr("d * d")).as("sdd")).collect().head
    val (n, sd, sq, sdq, sdd) = (m.getAs[Long]("n").toDouble, m.getAs[Long]("sd").toDouble,
      m.getAs[Long]("sq").toDouble, m.getAs[Long]("sdq").toDouble, m.getAs[Long]("sdd").toDouble)
    val expect = (n * sdq - sd * sq) / (n * sdd - sd * sd)
    assert(math.abs(pooled.head - expect) < 1e-9 * (1.0 + math.abs(expect)))
  }

  test("seasonal_strength: strengths recompute from published variances, in [0,1]") {
    val r = rows("seasonal_strength").head
    val vr = r.getAs[Double]("var_residual")
    val vd = r.getAs[Double]("var_detrended")
    val vt = r.getAs[Double]("var_deseasonalized")
    val fs = r.getAs[Double]("seasonal_strength")
    val ft = r.getAs[Double]("trend_strength")
    assert(vr >= 0.0 && vd >= 0.0 && vt >= 0.0)
    Seq(fs, ft).foreach(f => assert(f >= 0.0 && f <= 1.0))
    def strength(denom: Double): Double =
      if (denom == 0.0) 0.0 else math.max(0.0, 1.0 - vr / denom)
    assert(math.abs(fs - strength(vd)) < 1e-12)
    assert(math.abs(ft - strength(vt)) < 1e-12)
    // removing the seasonal means can only reduce variance (OLS-like
    // projection property of per-cell means on the detrended series)
    assert(vr <= vd + 1e-9)
  }
}
