package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 seventeenth-wave pins (Page-Hinkley, Jarque-Bera). */
class Round13rSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("page_hinkley_drift: matches a driver-side sequential replay") {
    val r = SparkEntry.queries("page_hinkley_drift")(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val ys = graft.core.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(expr("CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000) AS BIGINT)").as("y"))
      .orderBy("d").collect()
      .map(x => (x.getAs[java.sql.Date]("d").toString, x.getAs[Long]("y")))
    var cum = 0L; var t = 0L; var m = BigDecimal(0); var mmin = BigDecimal(0)
    var maxPh = 0.0; var alarms = 0L; var first: Option[String] = None
    ys.foreach { case (d, y) =>
      t += 1; cum += y
      val term = BigDecimal((t.toDouble * y - cum) / t - 200.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      m += term
      if (m < mmin) mmin = m
      val ph = (m - mmin).toDouble
      if (ph > maxPh) maxPh = ph
      if (ph > 5000.0) { alarms += 1; if (first.isEmpty) first = Some(d) }
    }
    assert(r.getAs[Long]("n_days") == ys.length)
    assert(math.abs(r.getAs[Double]("max_ph") - maxPh) < 1e-6 * (1.0 + maxPh),
      s"max_ph: got ${r.getAs[Double]("max_ph")}, replay $maxPh")
    assert(r.getAs[Long]("n_alarm_days") == alarms)
    assert(r.getAs[String]("first_alarm_day") == first.getOrElse("none"))
  }

  test("jarque_bera: skewness/kurtosis/JB recompute from raw moments") {
    val r = SparkEntry.queries("jarque_bera")(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val cs = graft.core.Tables(spark, sf).events
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(_.getAs[Long]("c"))
    val n = cs.length.toDouble
    val mean = cs.map(BigInt(_)).sum.toDouble / n
    def m(k: Int): Double = cs.map(c => math.pow(c - mean, k)).sum / n
    val skew = m(3) / math.pow(m(2), 1.5)
    val kurt = m(4) / (m(2) * m(2)) - 3.0
    val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert(math.abs(r.getAs[Double]("skewness") - skew) < 1e-6 * (1.0 + math.abs(skew)))
    assert(math.abs(r.getAs[Double]("excess_kurtosis") - kurt) < 1e-6 * (1.0 + math.abs(kurt)))
    assert(math.abs(r.getAs[Double]("jb_stat") - jb) < 1e-5 * (1.0 + jb),
      s"JB: got ${r.getAs[Double]("jb_stat")}, replay $jb")
    assert(r.getAs[Int]("non_normal") == (if (r.getAs[Double]("jb_stat") > 5.991) 1 else 0))
  }
}
