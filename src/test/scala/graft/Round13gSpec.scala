package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 sixth-wave pins (Ljung-Box, Durbin-Watson, runs test,
  * McNemar, zone overlap depth, doc-length percentiles): hash parity
  * proves Spark == DuckDB; these prove the statistic / layout claim.
  */
class Round13gSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("ljung_box: Q pools the published acf values") {
    val r = rows("ljung_box")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    assert(row.getAs[Long]("df") == 7L)
    // recompute Q from autocorr_lag's own published r_k
    val acf = rows("autocorr_lag").map(x =>
      (x.getAs[Int]("lag"), x.getAs[Double]("acf"))).toMap
    val q = n * (n + 2.0) * (1 to 7).map(k => acf(k) * acf(k) / (n - k)).sum
    assert(math.abs(row.getAs[Double]("q_stat") - q) < 1e-6,
      s"Q mismatch: got ${row.getAs[Double]("q_stat")}, from acf $q")
  }

  test("durbin_watson: DW within [0,4], rho consistent") {
    val r = rows("durbin_watson")
    assert(r.length == 1)
    val row = r.head
    val dw = row.getAs[Double]("dw_stat")
    assert(dw >= 0.0 && dw <= 4.0 + 1e-9)
    assert(math.abs(row.getAs[Double]("rho_lag1") - (1.0 - dw / 2.0)) < 1e-12)
    assert(row.getAs[Int]("positive_autocorr") == (if (dw < 1.5) 1 else 0))
  }

  test("runs_test: run count bounded, z matches the moment recompute") {
    val r = rows("runs_test")
    assert(r.length == 1)
    val row = r.head
    val n1 = row.getAs[Long]("n_above")
    val n2 = row.getAs[Long]("n_below")
    val runs = row.getAs[Long]("n_runs")
    assert(runs >= 1 && runs <= n1 + n2)
    // above/below median counts differ by at most the tie mass parity
    assert(math.abs(n1 - n2) <= 1L,
      "lower-median split leaves near-equal halves after dropping ties")
    val n = (n1 + n2).toDouble
    val e = 1.0 + 2.0 * n1 * n2 / n
    val v = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
    val z = (runs - e) / math.sqrt(v)
    assert(math.abs(row.getAs[Double]("z_stat") - z) < 1e-9)
  }

  test("mcnemar_test: chi2 from the b/c cells, cells within customer count") {
    val r = rows("mcnemar_test")
    assert(r.length == 1)
    val row = r.head
    val b = row.getAs[Long]("n_first_only")
    val c = row.getAs[Long]("n_second_only")
    val n = row.getAs[Long]("n_customers")
    assert(b + c <= n)
    val chi2 = if (b + c == 0) 0.0
      else math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-12)
  }

  test("zone_overlap_depth: shares sum to 1, depth bounded by file count") {
    val r = rows("zone_overlap_depth")
    assert(r.nonEmpty)
    assert(math.abs(r.map(_.getAs[Double]("share_days")).sum - 1.0) < 1e-9)
    val maxFiles = rows("zone_map_prune").head.getAs[Long]("n_files")
    r.foreach { row =>
      val d = row.getAs[Long]("depth")
      assert(d >= 1 && d <= maxFiles)
      assert(row.getAs[Long]("n_days") >= row.getAs[Long]("n_segments"),
        "every segment spans at least one day")
    }
  }

  test("doclen_percentiles_by_source: ordered percentiles, mean within range") {
    val r = rows("doclen_percentiles_by_source")
    assert(r.nonEmpty)
    val totalDocs = r.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == graft.core.Tables(spark, sf).documents.count())
    r.foreach { row =>
      val p10 = row.getAs[Long]("p10_tokens")
      val p50 = row.getAs[Long]("p50_tokens")
      val p90 = row.getAs[Long]("p90_tokens")
      val p99 = row.getAs[Long]("p99_tokens")
      assert(p10 <= p50 && p50 <= p90 && p90 <= p99)
      val mean = row.getAs[Double]("mean_tokens")
      assert(mean > 0.0)
      assert(row.getAs[Long]("total_tokens") ==
        math.round(mean * row.getAs[Long]("n_docs")))
    }
  }
}
