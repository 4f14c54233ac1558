package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 fifteenth-wave pins (Mood's median, split conformal). */
class Round13pSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def orders() = {
    import org.apache.spark.sql.functions._
    graft.core.Tables(spark, sf).orders
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("v")))
  }

  test("mood_median_test: median and chi2 replay exactly") {
    val r = SparkEntry.queries("mood_median_test")(spark, sf).collect().head
    val os = orders()
    val sorted = os.map(_._3).sorted
    val med = sorted((sorted.length + 1) / 2 - 1) // lower median, ceil-rank
    assert(math.abs(r.getAs[Double]("median_price") - med / 100.0) < 1e-9)
    val groups = os.groupBy(_._2)
    val nn = os.length.toDouble
    val ta = os.count(_._3 > med).toDouble
    val chi2 = groups.values.map { g =>
      val n = g.length.toDouble; val a = g.count(_._3 > med).toDouble
      val ea = n * ta / nn; val eb = n * (nn - ta) / nn
      (a - ea) * (a - ea) / ea + ((n - a) - eb) * ((n - a) - eb) / eb
    }.sum
    val got = r.getAs[Double]("chi2")
    assert(math.abs(got - chi2) < 1e-9 * (1.0 + chi2), s"chi2: $got vs $chi2")
    assert(r.getAs[Int]("significant") == (if (got > 9.488) 1 else 0))
  }

  test("conformal_interval: quantile and coverage replay; finite-sample validity") {
    val r = SparkEntry.queries("conformal_interval")(spark, sf).collect().head
    val os = orders()
    def bucket(k: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      val hex = h.take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val tagged = os.map { case (k, g, v) =>
      val b = bucket(k)
      (if (b < 70) "train" else if (b < 90) "cal" else "test", g, v)
    }
    val mu = tagged.filter(_._1 == "train").groupBy(_._2)
      .map { case (g, rows) => g -> rows.map(x => BigInt(x._3)).sum.toDouble / rows.length }
    val resid = tagged.filter(_._1 != "train")
      .map { case (s, g, v) => (s, math.round(math.abs(v - mu(g)))) }
    val cal = resid.filter(_._1 == "cal").map(_._2).sorted
    val k = math.min((9L * cal.length + 18) / 10, cal.length.toLong).toInt
    val q = cal(k - 1)
    assert(r.getAs[Long]("n_cal") == cal.length)
    assert(math.abs(r.getAs[Double]("q90_halfwidth") - q / 100.0) < 1e-9,
      s"q: got ${r.getAs[Double]("q90_halfwidth")}, replay ${q / 100.0}")
    val test = resid.filter(_._1 == "test")
    val cov = test.count(_._2 <= q).toDouble / test.length
    assert(math.abs(r.getAs[Double]("coverage") - cov) < 1e-12)
    // the conformal guarantee is in expectation; a calibrated fixed
    // split should land in a generous band around the target
    assert(cov > 0.8 && cov <= 1.0)
  }
}
