package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 fourteenth-wave pins (log-rank, Mann-Kendall,
  * Engle-Granger). */
class Round13oSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("logrank_test: chi2 recomputes from the published O/E/V, flag consistent") {
    val r = rows("logrank_test").head
    val o = r.getAs[Long]("observed_a").toDouble
    val e = r.getAs[Double]("expected_a")
    val v = r.getAs[Double]("variance_a")
    val chi2 = r.getAs[Double]("logrank_chi2")
    assert(v > 0.0)
    assert(math.abs(chi2 - (o - e) * (o - e) / v) < 1e-9 * (1.0 + chi2))
    assert(r.getAs[Int]("significant") == (if (chi2 > 3.841) 1 else 0))
    assert(r.getAs[Long]("n_event_weeks") > 0L)
  }

  test("mann_kendall_trend: S and Var(S) recompute exactly from the month series") {
    val r = rows("mann_kendall_trend").head
    import org.apache.spark.sql.functions._
    val ys = graft.core.Tables(spark, sf).orders
      .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("y"))
      .orderBy("m").collect().map(_.getAs[Long]("y"))
    val n = ys.length
    var s = 0L
    for (i <- 0 until n; j <- (i + 1) until n)
      s += java.lang.Long.signum(ys(j) - ys(i))
    val ties = ys.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - ties) / 18.0
    assert(r.getAs[Long]("n_months") == n)
    assert(r.getAs[Long]("s_stat") == s, s"S: got ${r.getAs[Long]("s_stat")}, replay $s")
    assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-9)
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-12)
    assert(r.getAs[Int]("direction") == java.lang.Long.signum(s).toInt)
  }

  test("engle_granger_coint: DF t recomputes from a driver-side two-step replay") {
    val r = rows("engle_granger_coint").head
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val monthly = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(t.nation.select(col("n_nationkey"), col("n_regionkey")), col("c_nationkey") === col("n_nationkey"))
      .join(t.region.select(col("r_regionkey"), col("r_name")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("AMERICA", "ASIA"))
      .groupBy(col("r_name"), expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) div 100000").as("v"))
      .collect().map(x => (x.getAs[String]("r_name"),
        x.getAs[Number]("m").longValue(), x.getAs[Number]("v").longValue()))
    val am = monthly.filter(_._1 == "AMERICA").map(x => x._2 -> x._3).toMap
    val as = monthly.filter(_._1 == "ASIA").map(x => x._2 -> x._3).toMap
    val ms = am.keySet.intersect(as.keySet).toSeq.sorted
    val xs = ms.map(am); val ysr = ms.map(as)
    val n = ms.length.toDouble
    val (sx, sy) = (xs.map(BigInt(_)).sum.toDouble, ysr.map(BigInt(_)).sum.toDouble)
    val sxx = xs.map(v => BigInt(v) * BigInt(v)).sum.toDouble
    val sxy = xs.zip(ysr).map { case (a, b) => BigInt(a) * BigInt(b) }.sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e = xs.zip(ysr).map { case (xv, yv) => math.round(yv - (a + b * xv)) }
    val e1 = e.dropRight(1); val de = e.tail.zip(e1).map { case (c, p) => c - p }
    val sede = e1.zip(de).map { case (p, d) => BigInt(p) * BigInt(d) }.sum.toDouble
    val se2 = e1.map(p => BigInt(p) * BigInt(p)).sum.toDouble
    val sde2 = de.map(d => BigInt(d) * BigInt(d)).sum.toDouble
    val rho = sede / se2
    val s2 = (sde2 - 2 * rho * sede + rho * rho * se2) / (de.length - 2.0)
    val dfT = rho * math.sqrt(se2) / math.sqrt(s2)
    val got = r.getAs[Double]("df_t")
    assert(math.abs(got - dfT) < 1e-6 * (1.0 + math.abs(dfT)),
      s"df_t: got $got, replay $dfT")
    assert(r.getAs[Int]("cointegrated") == (if (got < -3.37) 1 else 0))
  }
}
