package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 eighteenth-wave pins (POT/GPD tail, capture-recapture). */
class Round13sSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("pot_tail_fit: threshold and MoM GPD replay from the value list") {
    val r = SparkEntry.queries("pot_tail_fit")(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val vs = graft.core.Tables(spark, sf).orders
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().map(_.getAs[Long]("v")).sorted
    val n = vs.length
    val u = vs((19 * n + 19) / 20 - 1)
    assert(math.abs(r.getAs[Double]("threshold_p95") - u / 100.0) < 1e-9)
    val ex = vs.filter(_ > u).map(_ - u)
    assert(r.getAs[Long]("n_exceed") == ex.length)
    val m = ex.map(BigInt(_)).sum.toDouble / ex.length
    val s2 = (ex.map(e => BigInt(e) * BigInt(e)).sum.toDouble -
      ex.map(BigInt(_)).sum.toDouble * ex.map(BigInt(_)).sum.toDouble / ex.length) /
      (ex.length - 1.0)
    val ratio = m * m / s2
    val xi = (1.0 - ratio) / 2.0
    val sigma = m * (ratio + 1.0) / 2.0
    assert(math.abs(r.getAs[Double]("gpd_xi") - xi) < 1e-9 * (1.0 + math.abs(xi)),
      s"xi: got ${r.getAs[Double]("gpd_xi")}, replay $xi")
    assert(math.abs(r.getAs[Double]("gpd_sigma") - sigma / 100.0) < 1e-6)
    assert(r.getAs[Int]("heavy_tail") == (if (xi > 0) 1 else 0))
  }

  test("capture_recapture_dupes: Chapman estimator identities and bounds") {
    val r = SparkEntry.queries("capture_recapture_dupes")(spark, sf).collect().head
    val n1 = r.getAs[Long]("n_minhash"); val n2 = r.getAs[Long]("n_simhash")
    val m = r.getAs[Long]("n_overlap"); val u = r.getAs[Long]("n_union")
    assert(m <= math.min(n1, n2))
    assert(u == n1 + n2 - m, "inclusion-exclusion on the pair sets")
    val est = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(r.getAs[Double]("chapman_estimate") - est) < 1e-9 * (1.0 + est))
    // the estimate can never undercut what was actually observed
    assert(r.getAs[Double]("ci_low") >= u - 1e-9)
    assert(r.getAs[Double]("ci_high") >= r.getAs[Double]("chapman_estimate") - 1e-9)
    val se = math.sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m) /
      ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-9 * (1.0 + se))
    assert(math.abs(r.getAs[Double]("undetected_estimate") -
      math.max(0.0, est - u)) < 1e-9)
  }
}
