package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 fourth-wave pins (dup-ngram coverage, Adamic-Adar, Theil
  * decomposition, Friedman, zone-map pruning, shuffle-partition sim):
  * the oracle hash proves Spark == DuckDB; these prove the statistic
  * / audit quantity itself.
  */
class Round13eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("dup_ngram_coverage: coverage bounded, docs partition the corpus") {
    val r = rows("dup_ngram_coverage")
    assert(r.nonEmpty)
    val total = r.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.core.Tables(spark, sf).documents.count()
    assert(total == nDocs, "every document belongs to exactly one source")
    r.foreach { row =>
      val sh = row.getAs[Long]("n_shingles")
      val dup = row.getAs[Long]("n_dup_shingles")
      assert(dup <= sh)
      val cov = row.getAs[Double]("dup_coverage")
      assert(cov >= 0.0 && cov <= 1.0)
      assert(row.getAs[Long]("n_docs_high_dup") <= row.getAs[Long]("n_docs"))
    }
  }

  test("adamic_adar_links: scores in (0, common/ln2], ranked desc") {
    val r = rows("adamic_adar_links")
    assert(r.nonEmpty)
    var last = Double.MaxValue
    r.foreach { row =>
      val aa = row.getAs[Double]("adamic_adar")
      val common = row.getAs[Long]("common")
      assert(common >= 1L)
      assert(aa > 0.0)
      // each contribution is 1/ln(deg) ≤ 1/ln 2 (deg ≥ 2 for a wedge
      // center), quantized at 9 dp
      assert(aa <= common / math.log(2.0) + 1e-6)
      assert(aa <= last + 1e-12, "must be ranked by score desc")
      last = aa
    }
  }

  test("theil_decomposition: shares sum to 1, within >= 0, decomposition " +
      "matches a driver-side total Theil") {
    val r = rows("theil_decomposition")
    assert(r.nonEmpty)
    assert(math.abs(r.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-9)
    r.foreach { row =>
      assert(row.getAs[Double]("theil_within_g") >= -1e-6,
        "within-group Theil is nonnegative (up to 9-dp quantization)")
    }
    val decomposed = r.map(row =>
      row.getAs[Double]("between_term") + row.getAs[Double]("within_term")).sum
    // driver-side total Theil from the same customer frame
    val ys = graft.core.Tables(spark, sf).orders
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 10) AS BIGINT)").as("y"))
      .collect().map(_.getAs[Long]("y").toDouble)
    val n = ys.length
    val mu = ys.sum / n
    val totalT = ys.map(y => (y / (mu * n)) * math.log(y / mu)).sum
    assert(math.abs(decomposed - totalT) < 1e-4,
      s"between+within ($decomposed) must equal total Theil ($totalT)")
  }

  test("friedman_test: chi2 matches a driver-side recompute on average ranks") {
    val r = rows("friedman_test")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("k_treatments") == 7L)
    val b = row.getAs[Long]("n_blocks")
    val cells = graft.core.Tables(spark, sf).orders
      .groupBy(org.apache.spark.sql.functions.expr(
          "year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"),
        org.apache.spark.sql.functions.expr(
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1990-01-01') AS BIGINT) % 7").as("wd"))
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 100) AS BIGINT)").as("y"))
      .collect().map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue,
        x.getAs[Number](2).longValue))
    // only complete blocks (all 7 weekday cells) enter the test
    val byBlock = cells.groupBy(_._1).filter { case (_, v) => v.length == 7 }
    assert(b == byBlock.size.toLong)
    // average ranks per block
    val rj = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    byBlock.values.foreach { blk =>
      val sorted = blk.sortBy(_._3)
      val ranks = blk.map { case (_, wd, y) =>
        val below = blk.count(_._3 < y)
        val ties = blk.count(_._3 == y)
        (wd, below + (ties + 1) / 2.0)
      }
      ranks.foreach { case (wd, rk) => rj(wd) += rk }
    }
    val k = 7
    val chi2 = 12.0 / (b * k * (k + 1)) * rj.values.map(v => v * v).sum -
      3.0 * b * (k + 1)
    val got = row.getAs[Double]("chi2_f")
    assert(math.abs(got - chi2) < 1e-6, s"chi2 mismatch: got $got, recomputed $chi2")
  }

  test("zone_map_prune: partition identity, scan covers every match, " +
      "clustering never prunes less") {
    val r = rows("zone_map_prune")
    assert(r.length == 6, "2 layouts x 3 predicates")
    val li = graft.core.Tables(spark, sf).lineitem.count()
    r.foreach { row =>
      assert(row.getAs[Long]("rows_total") == li)
      assert(row.getAs[Long]("n_files_scanned") + row.getAs[Long]("n_files_pruned")
        == row.getAs[Long]("n_files"))
      val pr = row.getAs[Double]("prune_ratio")
      assert(pr >= 0.0 && pr <= 1.0)
      // zone maps are conservative: a pruned file can contain NO
      // matching row, so every match lives in a scanned file
      assert(row.getAs[Long]("rows_scanned") >= row.getAs[Long]("rows_matching"))
      assert(row.getAs[Double]("scan_amplification") >= 1.0 - 1e-12 ||
        row.getAs[Long]("rows_matching") == 0L)
    }
    // the date-clustered layout scans no more rows than insert order
    // for a date predicate, per predicate
    r.groupBy(_.getAs[String]("predicate")).values.foreach { g =>
      val ins = g.find(_.getAs[String]("layout") == "insert_order").get
      val cl = g.find(_.getAs[String]("layout") == "clustered_by_date").get
      assert(cl.getAs[Long]("rows_scanned") <= ins.getAs[Long]("rows_scanned"))
      // match counts are layout-independent
      assert(cl.getAs[Long]("rows_matching") == ins.getAs[Long]("rows_matching"))
    }
  }

  test("shuffle_partition_sim: rows partitioned, splits follow the skew rule") {
    val r = rows("shuffle_partition_sim")
    assert(r.length <= 32 && r.nonEmpty)
    val li = graft.core.Tables(spark, sf).lineitem.count()
    assert(r.map(_.getAs[Long]("n_rows")).sum == li)
    assert(math.abs(r.map(_.getAs[Double]("row_share")).sum - 1.0) < 1e-9)
    val med = r.head.getAs[Long]("median_rows")
    r.foreach { row =>
      assert(row.getAs[Long]("median_rows") == med)
      assert(row.getAs[Long]("n_keys") <= row.getAs[Long]("n_rows"))
      val skewed = row.getAs[Int]("skewed") == 1
      val splits = row.getAs[Long]("n_splits")
      if (skewed) assert(splits >= 6L, "rows > 5*median implies >= 6 splits")
      else assert(splits == 1L)
    }
  }
}
