package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 third-wave pins (LSH recall audit, k-anonymity audit,
  * join-key skew audit, weekday ANOVA): the oracle hash proves
  * Spark == DuckDB; these prove the audited quantity itself.
  */
class Round13dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("lsh_recall_audit: recall within [0,1], hits bounded by truth, " +
      "theory follows the S-curve") {
    val r = rows("lsh_recall_audit")
    assert(r.nonEmpty)
    var lastTheory = -1.0
    r.sortBy(_.getAs[Long]("bucket")).foreach { row =>
      val nTrue = row.getAs[Long]("n_true")
      val nHit = row.getAs[Long]("n_hit")
      assert(nHit <= nTrue, "cannot recall more pairs than exist")
      val rec = row.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      val th = row.getAs[Double]("theory_recall")
      assert(th >= 0.0 && th <= 1.0)
      assert(th >= lastTheory - 1e-12,
        "the S-curve is monotone in the Jaccard bucket")
      lastTheory = th
      // every surviving bucket is ≥ τ=0.5 — the truth set is the
      // exact τ=0.5 pair frame
      assert(row.getAs[Double]("jaccard_lo") >= 0.5 - 1e-12)
    }
  }

  test("k_anonymity_audit: shares sum to 1, bands partition the dim, " +
      "min_k respects its band bounds") {
    val r = rows("k_anonymity_audit")
    assert(r.nonEmpty)
    val shareSum = r.map(_.getAs[Double]("share_customers")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val total = r.map(_.getAs[Long]("n_customers")).sum
    val dim = graft.core.Tables(spark, sf).customer.count()
    assert(total == dim, "bands must partition every customer exactly once")
    r.foreach { row =>
      val mk = row.getAs[Long]("min_k")
      row.getAs[String]("band") match {
        case "1_unique" => assert(mk == 1L)
        case "2_to_4"   => assert(mk >= 2L && mk <= 4L)
        case "5_to_9"   => assert(mk >= 5L && mk <= 9L)
        case "10_plus"  => assert(mk >= 10L)
        case other      => fail(s"unknown band $other")
      }
    }
  }

  test("join_key_skew_audit: percentiles ordered, top1 share consistent, " +
      "row totals match the fact tables") {
    val r = rows("join_key_skew_audit")
    assert(r.length == 2)
    val t = graft.core.Tables(spark, sf)
    val expected = Map(
      "lineitem.l_partkey" -> t.lineitem.count(),
      "orders.o_custkey" -> t.orders.count())
    r.foreach { row =>
      val key = row.getAs[String]("join_key")
      assert(row.getAs[Long]("n_rows") == expected(key))
      val p50 = row.getAs[Long]("p50_mult")
      val p99 = row.getAs[Long]("p99_mult")
      val mx = row.getAs[Long]("max_mult")
      assert(p50 <= p99 && p99 <= mx)
      val top1 = row.getAs[Double]("top1_share")
      assert(math.abs(top1 - mx.toDouble / expected(key)) < 1e-12)
      assert(row.getAs[Double]("skew_ratio") >= 1.0 - 1e-9,
        "max/mean multiplicity is >= 1 by definition")
    }
  }

  test("weekday_anova: F matches a driver-side recompute from the daily frame") {
    val r = rows("weekday_anova")
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    // recompute from the same daily aggregate
    val daily = graft.core.Tables(spark, sf).orders
      .groupBy("o_orderdate")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) / 1000) AS BIGINT)").as("y"))
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1990-01-01') AS BIGINT) % 7 AS wd",
        "y")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(n == daily.length.toLong)
    val groups = daily.groupBy(_._1).values.map(_.map(_._2.toDouble))
    val gm = daily.map(_._2.toDouble).sum / daily.length
    val ssb = groups.map(g => g.size * math.pow(g.sum / g.size - gm, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.size; g.map(v => math.pow(v - m, 2)).sum }).sum
    val f = (ssb / (7 - 1)) / (ssw / (daily.length - 7))
    val got = row.getAs[Double]("f_stat")
    // moment-form vs two-pass SSW differ only in float rounding
    assert(math.abs(got - f) / math.max(1.0, math.abs(f)) < 1e-6,
      s"F mismatch: got $got, recomputed $f")
  }
}
