package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 seventh-wave pins (Cook's distance, Grubbs, KPSS,
  * Cronbach α, price indices, Markov entropy rate). */
class Round13hSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("cooks_distance_months: leverages sum to p=2, all D >= 0") {
    val r = rows("cooks_distance_months")
    assert(r.nonEmpty)
    val levSum = r.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(levSum - 2.0) < 1e-9,
      s"simple-regression leverages sum to 2, got $levSum")
    r.foreach { row =>
      val h = row.getAs[Double]("leverage")
      assert(h > 0.0 && h < 1.0)
      assert(row.getAs[Double]("cooks_d") >= 0.0)
    }
  }

  test("grubbs_test: G matches the flagged month's standardized deviation") {
    val r = rows("grubbs_test")
    assert(r.length == 1)
    val row = r.head
    val g = row.getAs[Double]("g_stat")
    assert(g >= 0.0)
    val monthly = graft.core.Tables(spark, sf).orders
      .groupBy(org.apache.spark.sql.functions.expr(
        "year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000) AS BIGINT)").as("y"))
      .collect().map(_.getAs[Long]("y").toDouble)
    val n = monthly.length
    val mean = monthly.sum / n
    val sd = math.sqrt(monthly.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val gExp = monthly.map(v => math.abs(v - mean)).max / sd
    assert(math.abs(g - gExp) < 1e-9, s"got $g, recomputed $gExp")
    assert(math.abs(row.getAs[Long]("outlier_value") - mean) / sd - g < 1e-9)
  }

  test("kpss_stationarity: eta matches an integer-deviation recompute") {
    val r = rows("kpss_stationarity")
    assert(r.length == 1)
    val row = r.head
    val ys = graft.core.Tables(spark, sf).orders
      .groupBy(org.apache.spark.sql.functions.expr(
        "year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000) AS BIGINT)").as("y"))
      .orderBy("m").collect().map(_.getAs[Long]("y"))
    val n = ys.length
    val s = ys.sum
    val dev = ys.map(y => math.round(y.toDouble - s.toDouble / n))
    val st = dev.scanLeft(0L)(_ + _).tail
    val eta = st.map(v => v.toDouble * v).sum /
      (n * dev.map(v => v.toDouble * v).sum)
    assert(math.abs(row.getAs[Double]("eta") - eta) < 1e-9)
    assert(row.getAs[Double]("eta") >= 0.0)
  }

  test("cronbach_alpha: alpha <= 1, matches a driver-side recompute") {
    val r = rows("cronbach_alpha")
    assert(r.length == 1)
    val row = r.head
    val alpha = row.getAs[Double]("alpha")
    assert(alpha <= 1.0 + 1e-12)
    val cells = graft.core.Tables(spark, sf).orders
      .groupBy(org.apache.spark.sql.functions.expr(
          "year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"),
        org.apache.spark.sql.functions.expr(
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1990-01-01') AS BIGINT) % 7").as("wd"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 10000) AS BIGINT)").as("y"))
      .collect().map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue,
        x.getAs[Number](2).longValue))
    val full = cells.groupBy(_._1).filter(_._2.length == 7)
    val b = full.size
    def popVar(vs: Iterable[Double]): Double = {
      val m = vs.sum / vs.size
      vs.map(v => (v - m) * (v - m)).sum / vs.size
    }
    val itemVarSum = (0L to 6L).map { wd =>
      popVar(full.values.map(_.find(_._2 == wd).get._3.toDouble))
    }.sum
    val totVar = popVar(full.values.map(_.map(_._3).sum.toDouble))
    val exp = 7.0 / 6.0 * (1.0 - itemVarSum / totVar)
    assert(math.abs(alpha - exp) < 1e-9, s"got $alpha, recomputed $exp")
    assert(row.getAs[Long]("n_months") == b.toLong)
  }

  test("price_index_monthly: base month indexes exactly 1, fisher between L and P") {
    val r = rows("price_index_monthly")
    assert(r.nonEmpty)
    val base = r.minBy(_.getAs[Long]("month_id"))
    assert(base.getAs[Double]("laspeyres") == 1.0,
      "base month vs itself is exactly 1 (identical exact sums)")
    assert(base.getAs[Double]("paasche") == 1.0)
    r.foreach { row =>
      val l = row.getAs[Double]("laspeyres")
      val p = row.getAs[Double]("paasche")
      val f = row.getAs[Double]("fisher")
      assert(l > 0.0 && p > 0.0)
      assert(f >= math.min(l, p) - 1e-12 && f <= math.max(l, p) + 1e-12,
        "geometric mean lies between L and P")
      assert(row.getAs[Long]("n_matched_parts") > 0)
    }
  }

  test("markov_entropy_rate: 0 <= H <= ln(k)") {
    val r = rows("markov_entropy_rate")
    assert(r.length == 1)
    val row = r.head
    val h = row.getAs[Double]("entropy_rate_nats")
    val lnk = row.getAs[Double]("max_entropy_nats")
    val k = row.getAs[Long]("n_states")
    assert(math.abs(lnk - math.log(k.toDouble)) < 1e-9)
    assert(h >= -1e-6 && h <= lnk + 1e-6,
      "conditional entropy bounded by the uniform maximum")
    val gap = row.getAs[Double]("predictability_gap")
    assert(gap >= -1e-9 && gap <= 1.0 + 1e-9)
    assert(row.getAs[Long]("n_cells") <= k * k)
  }
}
