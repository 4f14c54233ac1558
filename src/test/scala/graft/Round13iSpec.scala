package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 eighth-wave pins (exact Shapley attribution, NB fit,
  * EOQ). */
class Round13iSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("shapley_attribution: efficiency axiom — phis sum to v(full) - v(empty)") {
    val r = rows("shapley_attribution")
    assert(r.length == 4)
    val vFull = r.head.getAs[Double]("v_full")
    val vEmpty = r.head.getAs[Double]("v_empty")
    assert(vFull >= 0.0 && vFull <= 1.0)
    assert(vEmpty >= 0.0 && vEmpty <= 1.0)
    val phiSum = r.map(_.getAs[Double]("phi")).sum
    assert(math.abs(phiSum - (vFull - vEmpty)) < 1e-9,
      s"efficiency: Σφ = $phiSum must equal v(N) − v(∅) = ${vFull - vEmpty}")
    val shareSum = r.map(_.getAs[Double]("share")).sum
    if (vFull != vEmpty) assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("shapley_attribution: matches a driver-side exact Shapley recompute") {
    val r = rows("shapley_attribution")
    import org.apache.spark.sql.functions._
    val users = graft.core.Tables(spark, sf).events
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("b0"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("b1"),
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("b2"),
        max(when(col("event_type") === "view", 1).otherwise(0)).as("b3"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .collect()
    val n = Array.fill(16)(0L); val c = Array.fill(16)(0L)
    users.foreach { row =>
      val m = row.getAs[Int]("b0") + 2 * row.getAs[Int]("b1") +
        4 * row.getAs[Int]("b2") + 8 * row.getAs[Int]("b3")
      n(m) += 1; c(m) += row.getAs[Int]("conv")
    }
    def v(m: Int): Double = if (n(m) == 0) 0.0 else c(m).toDouble / n(m)
    val fact = Array(1, 1, 2, 6)
    val chans = Seq("click", "error", "signup", "view")
    chans.zipWithIndex.foreach { case (ch, i) =>
      val bit = 1 << i
      val phi = (0 until 16).filter(m => (m & bit) == 0).map { m =>
        val s = Integer.bitCount(m)
        fact(s) * fact(3 - s) / 24.0 * (v(m | bit) - v(m))
      }.sum
      val got = rows("shapley_attribution")
        .find(_.getAs[String]("channel") == ch).get.getAs[Double]("phi")
      assert(math.abs(got - phi) < 1e-9, s"$ch: got $got, recomputed $phi")
    }
    assert(r.length == 4)
  }

  test("negative_binomial_fit: moments coherent, NB params only when overdispersed") {
    val r = rows("negative_binomial_fit")
    assert(r.length == 1)
    val row = r.head
    val m = row.getAs[Double]("mean_orders")
    val v = row.getAs[Double]("variance")
    assert(m > 0.0 && v >= 0.0)
    assert(math.abs(row.getAs[Double]("dispersion_index") - v / m) < 1e-12)
    if (row.getAs[Int]("overdispersed") == 1) {
      val rr = row.getAs[Double]("nb_size_r")
      val p = row.getAs[Double]("nb_prob_p")
      assert(rr > 0.0 && p > 0.0 && p < 1.0)
      // NB identities: mean = r(1−p)/p, var = r(1−p)/p²
      assert(math.abs(rr * (1 - p) / p - m) / m < 1e-9)
      assert(math.abs(rr * (1 - p) / (p * p) - v) / v < 1e-9)
    } else {
      assert(row.getAs[Double]("nb_size_r") == 0.0)
    }
  }

  test("inventory_eoq: EOQ formula identity per brand") {
    val r = rows("inventory_eoq")
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = row.getAs[Double]("annual_demand")
      val price = row.getAs[Double]("avg_unit_price")
      val eoq = row.getAs[Double]("eoq_units")
      assert(d > 0.0 && price > 0.0 && eoq > 0.0)
      val expected = math.sqrt(2.0 * d * 100.0 / (0.2 * price))
      assert(math.abs(eoq - expected) / expected < 1e-9)
      assert(math.abs(row.getAs[Double]("orders_per_year") - d / eoq) < 1e-9)
    }
  }
}
