package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 fifth-wave pins (Page trend, Hodges-Lehmann, Cochran-
  * Armitage, quantile-sketch audit, stylometric rank delta, mutual
  * information): hash parity proves Spark == DuckDB; these prove the
  * statistic / sketch-accuracy claim itself.
  */
class Round13fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("page_trend_test: same blocks as friedman, z matches L recompute") {
    val r = rows("page_trend_test")
    assert(r.length == 1)
    val row = r.head
    val b = row.getAs[Long]("n_blocks")
    assert(b == rows("friedman_test").head.getAs[Long]("n_blocks"),
      "Page and Friedman share the complete-block frame")
    val l = row.getAs[Double]("l_stat")
    val z = row.getAs[Double]("z_stat")
    val expZ = (l - 112.0 * b) / math.sqrt(49.0 * 64.0 * 6.0 / 144.0 * b)
    assert(math.abs(z - expZ) < 1e-9)
    // L bounds for k=7: b·Σj·j (identical ranks asc) .. within [b·84, b·140]
    assert(l >= 84.0 * b - 1e-9 && l <= 140.0 * b + 1e-9)
  }

  test("hodges_lehmann_shift: median of pair differences, bounded by extremes") {
    val r = rows("hodges_lehmann_shift")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("region_a") < row.getAs[String]("region_b"))
    val hl = row.getAs[Long]("hl_shift")
    val mean = row.getAs[Double]("mean_shift")
    val np = row.getAs[Long]("n_pairs")
    // driver-side recompute of the whole statistic
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val monthly = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t.nation.select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(t.region.select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(expr("CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 100) AS BIGINT)").as("y"))
      .collect().map(x => (x.getString(0), x.getAs[Number](1).longValue, x.getLong(2)))
    val names = monthly.map(_._1).distinct.sorted
    val ya = monthly.filter(_._1 == names(0)).map(_._3)
    val yb = monthly.filter(_._1 == names(1)).map(_._3)
    val diffs = (for (a <- ya; b <- yb) yield a - b).sorted
    assert(np == diffs.length.toLong)
    assert(hl == diffs((diffs.length + 1) / 2 - 1),
      "HL is the lower-median pair difference")
    assert(math.abs(mean - diffs.map(_.toDouble).sum / diffs.length) < 1e-6)
  }

  test("cochran_armitage_trend: z matches a driver-side recompute") {
    val r = rows("cochran_armitage_trend")
    assert(r.length == 1)
    val row = r.head
    val t = graft.core.Tables(spark, sf)
    import org.apache.spark.sql.functions._
    val resp = t.orders
      .join(t.lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val cust = t.customer.select("c_custkey", "c_acctbal").collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
      .sortBy { case (k, bal) => (bal, k) }
    val n = cust.length
    // ntile(5) split sizes
    val base = n / 5
    val rem = n % 5
    var idx = 0
    val moments = (1 to 5).map { j =>
      val sz = base + (if (j <= rem) 1 else 0)
      val grp = cust.slice(idx, idx + sz)
      idx += sz
      val rj = grp.count { case (k, _) => resp.contains(k) }
      (j.toLong, sz.toLong, rj.toLong)
    }
    val nn = moments.map(_._2).sum
    val rr = moments.map(_._3).sum
    val s1 = moments.map(m => m._1 * m._2).sum
    val s2 = moments.map(m => m._1 * m._1 * m._2).sum
    val t1 = moments.map(m => m._1 * m._3).sum
    val p = rr.toDouble / nn
    val num = t1 - p * s1
    val v = p * (1 - p) * (s2 - s1.toDouble * s1 / nn)
    val z = if (v <= 0) 0.0 else num / math.sqrt(v)
    assert(row.getAs[Long]("n_customers") == nn)
    assert(row.getAs[Long]("n_responders") == rr)
    assert(math.abs(row.getAs[Double]("z_trend") - z) < 1e-6,
      s"z mismatch: got ${row.getAs[Double]("z_trend")}, recomputed $z")
  }

  test("quantile_sketch_audit: estimate within one bucket width of exact") {
    val r = rows("quantile_sketch_audit")
    assert(r.length == 3)
    val vals = graft.core.Tables(spark, sf).orders
      .selectExpr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .collect().map(_.getLong(0))
    val width = (vals.max - vals.min + 1) / 256 + 1
    r.foreach { row =>
      // the ceil-rank bucket CONTAINS the exact quantile value, so the
      // midpoint estimate is off by at most the bucket width
      assert(row.getAs[Long]("abs_err") <= width,
        s"estimate strayed beyond its bucket: ${row.getAs[Long]("abs_err")} > $width")
      assert(row.getAs[Long]("n_rows") == vals.length.toLong)
      // exact quantile is the ceil-rank order statistic
      val q = row.getAs[Long]("q")
      val sorted = vals.sorted
      val pos = ((q * vals.length + 99) / 100).toInt
      assert(row.getAs[Long]("exact_value") == sorted(pos - 1))
    }
  }

  test("stylometry_delta_matrix: full pair grid, rho within [-1,1], " +
      "delta and rho coherent") {
    val r = rows("stylometry_delta_matrix")
    val s = (1 + math.sqrt(1 + 8.0 * r.length)) / 2
    assert(s == math.floor(s), s"row count ${r.length} must be S(S-1)/2")
    r.foreach { row =>
      assert(row.getAs[Long]("n_terms") == 30L)
      val d = row.getAs[Double]("rank_delta")
      val rho = row.getAs[Double]("spearman_rho")
      assert(d >= 0.0 && d <= 15.0 + 1e-9, "mean |rank shift| of 1..30 is <= 15")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
      if (d == 0.0) assert(math.abs(rho - 1.0) < 1e-12)
    }
  }

  test("mutual_information_matrix: MI within [0, min(H)], NMI normalized") {
    val r = rows("mutual_information_matrix")
    assert(r.length == 3)
    r.foreach { row =>
      val mi = row.getAs[Double]("mi_nats")
      val ha = row.getAs[Double]("h_a")
      val hb = row.getAs[Double]("h_b")
      assert(ha >= -1e-9 && hb >= -1e-9)
      assert(mi >= -1e-6, "MI is nonnegative (up to 9-dp quantization)")
      assert(mi <= math.min(ha, hb) + 1e-6, "MI bounded by the weaker entropy")
      val nmi = row.getAs[Double]("nmi")
      assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-6)
    }
  }
}
