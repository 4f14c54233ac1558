package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Round-11 pins: the events `ts` physical-layout drift that zeroed
  * round 10 (the driver regenerated testdata from parquet
  * TIMESTAMP(NANOS) to plain `timestamp[us]`) must never zero a round
  * again. `Tables.events` branches on the read schema; these tests pin
  * that every layout the driver has ever shipped — and the NTZ/LTZ
  * variants Spark can produce — yields the exact same `ts_us`.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(df: DataFrame): String = {
    val tmp = Files.createTempDirectory("graft_tsdrift").toString
    df.write.parquet(s"$tmp/events.parquet")
    tmp
  }

  // canonical fixture in epoch micros, incl. a sub-ms tail that would
  // expose any ms-precision round-trip
  private val baseUs = Seq(
    (1L, 1700000000123456L),
    (2L, 1700000001999999L),
    (3L, 954430200000001L))

  test("Tables.events yields identical ts_us on nanos-long, timestamp and timestamp_ntz layouts") {
    val df = baseUs.toDF("event_id", "ts_us")
    val layouts = Seq(
      "nanos-long" -> df.select($"event_id", ($"ts_us" * 1000L).as("ts")),
      "timestamp_ltz" -> df.select($"event_id", timestamp_micros($"ts_us").as("ts")),
      "timestamp_ntz" -> df.select($"event_id",
        timestamp_micros($"ts_us").cast("timestamp_ntz").as("ts")))
    for ((label, layout) <- layouts) {
      val dir = writeEvents(layout)
      val got = graft.core.Tables(spark, dir).events
        .select("event_id", "ts_us").as[(Long, Long)].collect().toSet
      assert(got == baseUs.toSet, s"layout $label (${layout.schema("ts").dataType})")
    }
  }

  /** Mirror sf0.001 with `events.ts` re-encoded in a given physical
    * layout; every other table is symlinked, so the clone is cheap. */
  private def cloneSfWithEvents(events: DataFrame): String = {
    val tmp = Files.createTempDirectory("graft_sfclone").toString
    for (f <- new java.io.File(TestSpark.sf).listFiles()
         if f.getName != "events.parquet")
      Files.createSymbolicLink(Paths.get(s"$tmp/${f.getName}"), f.toPath)
    events.write.parquet(s"$tmp/events.parquet")
    tmp
  }

  test("entry path (factSales) runs on BOTH ts layouts of sf0.001 with equal counts") {
    val ev = graft.core.Tables(spark, TestSpark.sf).events
    val raw = ev.columns.filter(c => c != "ts_us" && c != "ts").map(col)
    val micros = ev.select(raw :+ timestamp_micros($"ts_us").as("ts"): _*)
    val nanosLong = ev.select(raw :+ ($"ts_us" * 1000L).as("ts"): _*)
    val a = graft.etl.StarSchema.factSales(spark, cloneSfWithEvents(micros)).count()
    val b = graft.etl.StarSchema.factSales(spark, cloneSfWithEvents(nanosLong)).count()
    assert(a > 0, "factSales must be non-empty on sf0.001 (driver smoke gate)")
    assert(a == b, s"layout-dependent factSales counts: micros=$a nanosLong=$b")
  }

  /** Clone sf0.001 with selected tables rewritten (others symlinked). */
  private def cloneSfWith(tables: Map[String, DataFrame]): String = {
    val tmp = Files.createTempDirectory("graft_sfdrift").toString
    for (f <- new java.io.File(TestSpark.sf).listFiles()
         if !tables.contains(f.getName.stripSuffix(".parquet")))
      Files.createSymbolicLink(Paths.get(s"$tmp/${f.getName}"), f.toPath)
    for ((name, df) <- tables) df.write.parquet(s"$tmp/$name.parquet")
    tmp
  }

  test("order/lineitem date columns survive a timestamp->DATE physical regen (r10 drift class)") {
    // the r10 zero-round came from events.ts changing physical type
    // under the driver's regen; orders/lineitem carry the same risk.
    // Re-encode their date-bearing columns as physical DATE and pin
    // that the query layer is invariant.
    val t = graft.core.Tables(spark, TestSpark.sf)
    val ordersDate = t.orders.withColumn("o_orderdate", $"o_orderdate".cast("date"))
    val lineitemDate = t.lineitem.withColumn("l_shipdate", $"l_shipdate".cast("date"))
    val drifted = cloneSfWith(Map("orders" -> ordersDate, "lineitem" -> lineitemDate))
    val pairs = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q1_pricing_summary" -> ((s, d) => graft.operators.Analytics.q1PricingSummary(s, d)),
      "q3_top_orders" -> ((s, d) => graft.operators.Analytics.q3TopOrders(s, d)),
      "growth_mom_yoy" -> ((s, d) => graft.operators.Reports.growthMomYoy(s, d)),
      "xyz_classification" -> ((s, d) => graft.operators.Reports.xyzClassification(s, d)))
    for ((name, fn) <- pairs) {
      val a = fn(spark, TestSpark.sf).collect()
      val b = fn(spark, drifted).collect()
      assert(a.toSeq == b.toSeq, s"$name differs under DATE-typed regen")
    }
  }

  // ---------------------------------------------- round-11 operator pins

  test("spearman_corr rho equals built-in corr of the doubled midranks to 1e-10") {
    val row = graft.operators.Stats.spearmanCorr(spark, TestSpark.sf).collect()(0)
    val rho = row.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    // independent re-derivation: Spark's corr() on the same midranks
    val t = graft.core.Tables(spark, TestSpark.sf)
    val perPart = t.lineitem.groupBy($"l_partkey")
      .agg(sum(expr("CAST(l_quantity * 100 AS BIGINT)")).as("qty_c"))
      .join(t.part.select($"p_partkey",
        expr("CAST(p_retailprice * 100 AS BIGINT)").as("price_c")),
        $"l_partkey" === $"p_partkey")
    import org.apache.spark.sql.expressions.Window
    val ranked = perPart
      .withColumn("rk_x", rank().over(Window.orderBy("price_c")))
      .withColumn("tc_x", count(lit(1)).over(Window.partitionBy("price_c")))
      .withColumn("rk_y", rank().over(Window.orderBy("qty_c")))
      .withColumn("tc_y", count(lit(1)).over(Window.partitionBy("qty_c")))
      .select(expr("CAST(2 * rk_x + tc_x - 1 AS DOUBLE)").as("rx"),
        expr("CAST(2 * rk_y + tc_y - 1 AS DOUBLE)").as("ry"))
    val builtin = ranked.agg(corr($"rx", $"ry")).collect()(0).getDouble(0)
    assert(math.abs(rho - builtin) < 1e-10, s"rho=$rho builtin=$builtin")
  }

  test("kendall_tau counts are consistent and tau_b is bounded") {
    val row = graft.operators.Stats.kendallTau(spark, TestSpark.sf).collect()(0)
    val (n0, c, d) = (row.getAs[Long]("n_pairs"),
      row.getAs[Long]("concordant"), row.getAs[Long]("discordant"))
    val tau = row.getAs[Double]("tau_b")
    assert(c + d <= n0, "concordant + discordant cannot exceed total pairs")
    assert(tau >= -1.0 && tau <= 1.0)
    assert((c > d) == (tau > 0), "tau sign must follow the concordance excess")
  }

  test("jackknife_region_var mean matches the direct mean and se >= 0") {
    val row = graft.operators.Stats.jackknifeRegionVar(spark, TestSpark.sf).collect()(0)
    val direct = graft.core.Tables(spark, TestSpark.sf).orders
      .agg((sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")) /
        count(lit(1))).cast("double")).collect()(0).getDouble(0)
    assert(math.abs(row.getAs[Double]("mean_value") - direct) < 1e-6)
    assert(row.getAs[Double]("jack_se") >= 0.0)
  }

  test("repeat_purchase_interval gap count reconciles to orders minus customers") {
    val out = graft.operators.Commerce.repeatPurchaseInterval(spark, TestSpark.sf)
    val nGaps = out.agg(sum($"n_gaps")).collect()(0).getLong(0)
    val o = graft.core.Tables(spark, TestSpark.sf).orders
    val expected = o.count() - o.select($"o_custkey").distinct().count()
    assert(nGaps == expected, s"gaps=$nGaps expected=$expected")
    for (r <- out.collect()) {
      val med = r.getAs[Double]("median_gap_days")
      val p90 = r.getAs[Long]("p90_gap_days")
      assert(med <= p90.toDouble, "median cannot exceed p90")
    }
  }

  test("churn_dormancy partitions the active customer base") {
    val out = graft.operators.Commerce.churnDormancy(spark, TestSpark.sf)
    val n = out.agg(sum($"n_customers")).collect()(0).getLong(0)
    val active = graft.core.Tables(spark, TestSpark.sf).orders
      .select($"o_custkey").distinct().count()
    assert(n == active, s"bands must partition: $n vs $active")
  }

  test("mips_topk ranks are dense 1..k and inner products non-increasing") {
    val rows = graft.operators.Ann.mipsTopk(spark, TestSpark.sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    for ((q, rs) <- byQ) {
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length),
        s"query $q ranks not dense")
      val ips = sorted.map(_.getAs[Long]("ip_q12"))
      assert(ips.zip(ips.tail).forall { case (a, b) => a >= b },
        s"query $q inner products must be non-increasing down the ranking")
    }
  }

  test("ann_recall_eval recall is hits/k and LSH recall clears the suite floor") {
    val rows = graft.operators.Ann.annRecallEval(spark, TestSpark.sf).collect()
    for (r <- rows) {
      val (k, hits) = (r.getAs[Long]("k"), r.getAs[Long]("hits"))
      assert(hits >= 0 && hits <= k)
      assert(r.getAs[Double]("recall") == hits.toDouble / k.toDouble)
    }
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.4, s"mean LSH recall $mean below the 0.4 suite floor")
  }

  test("hapax_ratio invariants: hapax <= vocab <= tokens") {
    for (r <- graft.operators.TextAnalysis.hapaxRatio(spark, TestSpark.sf).collect()) {
      val (v, h, t) = (r.getAs[Long]("vocab_size"),
        r.getAs[Long]("hapax_count"), r.getAs[Long]("n_tokens"))
      assert(h <= v && v <= t, s"source ${r.getString(0)}: h=$h v=$v t=$t")
    }
  }

  test("xyz_classification classes partition the sold parts and cv bands are ordered") {
    val out = graft.operators.Reports.xyzClassification(spark, TestSpark.sf).collect()
    val nParts = out.map(_.getAs[Long]("n_parts")).sum
    val sold = graft.core.Tables(spark, TestSpark.sf).lineitem
      .select($"l_partkey").distinct().count()
    assert(nParts == sold, s"classes must partition sold parts: $nParts vs $sold")
    for (r <- out) {
      assert(r.getAs[Double]("min_cv") >= 0.0)
      assert(r.getAs[Double]("min_cv") <= r.getAs[Double]("max_cv"))
    }
    val byClass = out.map(r => r.getString(0) -> r).toMap
    assert(byClass.keySet == Set("X_steady", "Y_variable", "Z_erratic"),
      "all three classes must be live on the testdata")
    for (x <- byClass.get("X_steady")) assert(x.getAs[Double]("max_cv") <= 1.5)
    for (z <- byClass.get("Z_erratic")) assert(z.getAs[Double]("min_cv") > 2.0)
  }

  test("ship_lag_profile covers every supplier with ordered percentiles") {
    val out = graft.operators.Reports.shipLagProfile(spark, TestSpark.sf).collect()
    val nSupp = graft.core.Tables(spark, TestSpark.sf).lineitem
      .select($"l_suppkey").distinct().count()
    assert(out.length == nSupp)
    for (r <- out) {
      assert(r.getAs[Double]("median_lag_days") <= r.getAs[Long]("p90_lag_days").toDouble)
      assert(r.getAs[Long]("n_lines") > 0)
    }
  }

  test("local_clustering coefficients are consistent with triangle_count totals") {
    val nodes = graft.operators.Graph.localClustering(spark, TestSpark.sf).collect()
    for (r <- nodes) {
      val c = r.getAs[Double]("clustering_coef")
      assert(c >= 0.0 && c <= 1.0, s"node ${r.getLong(0)}: coef $c out of range")
      val (deg, tri) = (r.getAs[Long]("deg"), r.getAs[Long]("triangles"))
      assert(tri <= deg * (deg - 1) / 2, "triangles cannot exceed neighbor pairs")
    }
    // Σ per-node triangle credits = 3 × global triangle count
    val total = graft.operators.Graph.triangleCount(spark, TestSpark.sf)
      .collect()(0).getAs[Long]("n_triangles")
    assert(nodes.map(_.getAs[Long]("triangles")).sum == 3 * total)
  }

  private def writeJsonlBatch(dir: String, name: String,
      evs: Seq[graft.streaming.EventStream.Ev]): Unit = {
    val lines = evs.map(e =>
      s"""{"event_id":${e.event_id},"ts_us":${e.ts_us},"user_id":${e.user_id},"event_type":"${e.event_type}","value":${e.value}}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
      lines.mkString("\n"))
  }

  test("streaming SpaceSaving summary merges across micro-batches to the exact counts") {
    import graft.streaming.EventStream
    val tmp = Files.createTempDirectory("graft_hh_stream").toString
    // no-eviction regime: ≤ 16 distinct users per type → exact counts owed
    writeJsonlBatch(tmp, "b1.jsonl", Seq(
      EventStream.Ev(1, 1000000L, 1, "click", 1.0),
      EventStream.Ev(2, 2000000L, 1, "click", 1.0),
      EventStream.Ev(3, 3000000L, 2, "click", 1.0),
      EventStream.Ev(4, 4000000L, 7, "view", 1.0)))
    val q = EventStream.heavyHittersStream(spark, tmp).writeStream
      .outputMode("complete").format("memory").queryName("hh_s").start()
    try {
      q.processAllAvailable()
      // second batch re-touches user 1 and adds a new user per type —
      // the stored summaries must merge, not reset
      writeJsonlBatch(tmp, "b2.jsonl", Seq(
        EventStream.Ev(5, 5000000L, 1, "click", 1.0),
        EventStream.Ev(6, 6000000L, 3, "click", 1.0),
        EventStream.Ev(7, 7000000L, 7, "view", 1.0)))
      q.processAllAvailable()
      val got = spark.table("hh_s")
        .selectExpr("event_type", "explode(hh) AS h")
        .select($"event_type", $"h.key", $"h.est", $"h.err")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expected = Map(
        ("click", 1L) -> 3L, ("click", 2L) -> 1L, ("click", 3L) -> 1L,
        ("view", 7L) -> 2L)
      assert(got.keySet == expected.keySet, s"keys ${got.keySet}")
      for ((k, cnt) <- expected) {
        assert(got(k)._1 == cnt, s"$k: est ${got(k)._1} != exact $cnt")
        assert(got(k)._2 == 0L, s"$k: no eviction happened, err must be 0")
      }
    } finally q.stop()
  }

  test("session_duration_profile bands partition sessions and bounces have zero duration") {
    val out = graft.operators.Analytics.sessionDurationProfile(spark, TestSpark.sf).collect()
    val nSessions = out.map(_.getAs[Long]("n_sessions")).sum
    val total = graft.operators.Analytics.sessionize(spark, TestSpark.sf).count()
    assert(nSessions == total, s"bands must partition sessions: $nSessions vs $total")
    for (r <- out if r.getString(0) == "a_single") {
      assert(r.getAs[Double]("mean_dur_sec") == 0.0, "bounce sessions span zero time")
      assert(r.getAs[Long]("p90_dur_us") == 0L)
    }
  }

  test("arc_elasticity covers two-sided brands with positive unit prices") {
    val out = graft.operators.Reports.arcElasticity(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Double]("unit_price_h1") > 0.0)
      assert(r.getAs[Double]("unit_price_h2") > 0.0)
      assert(r.getAs[Long]("qty_h1") > 0 && r.getAs[Long]("qty_h2") > 0)
    }
  }

  test("graph_modularity: CC partition makes every edge intra and bounds Q") {
    val row = graft.operators.Graph.graphModularity(spark, TestSpark.sf).collect()(0)
    assert(row.getAs[Long]("intra_edges") == row.getAs[Long]("n_edges"),
      "a component partition cannot cut an edge")
    val q = row.getAs[Double]("modularity")
    assert(q >= 0.0 && q < 1.0, s"CC modularity $q out of [0,1)")
  }

  test("order_size_distribution shares close to 1 and orders reconcile") {
    val out = graft.operators.Reports.orderSizeDistribution(spark, TestSpark.sf)
      .orderBy("n_lines").collect()
    val nOrders = out.map(_.getAs[Long]("n_orders")).sum
    val total = graft.core.Tables(spark, TestSpark.sf).lineitem
      .select($"l_orderkey").distinct().count()
    assert(nOrders == total)
    assert(math.abs(out.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
  }

  test("target_encode_brand shrinks every brand toward the global prior") {
    val rows = graft.operators.Features.targetEncodeBrand(spark, TestSpark.sf).collect()
    val nTot = rows.map(_.getAs[Long]("n_lines")).sum
    val posTot = rows.map(_.getAs[Long]("n_returned")).sum
    val prior = posTot.toDouble / nTot.toDouble
    for (r <- rows) {
      val (raw, sm) = (r.getAs[Double]("raw_rate"), r.getAs[Double]("smoothed_rate"))
      val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
      assert(sm >= lo - 1e-12 && sm <= hi + 1e-12,
        s"brand ${r.getString(0)}: smoothed $sm outside [$lo, $hi]")
    }
  }

  test("fano_burstiness events reconcile and the factor is non-negative") {
    val out = graft.operators.Stats.fanoBurstiness(spark, TestSpark.sf).collect()
    val nEvents = out.map(_.getAs[Long]("n_events")).sum
    assert(nEvents == graft.core.Tables(spark, TestSpark.sf).events.count())
    for (r <- out) assert(r.getAs[Double]("fano_factor") >= 0.0)
  }

  test("embedding_outliers ranks per label are dense and distances non-increasing") {
    val rows = graft.operators.Ann.embeddingOutliers(spark, TestSpark.sf).collect()
    for ((_, rs) <- rows.groupBy(_.getAs[Int]("label"))) {
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val d = sorted.map(_.getAs[Long]("dist2"))
      assert(d.zip(d.tail).forall { case (a, b) => a >= b })
    }
  }

  test("stickiness_ratio is bounded by (1/days_obs, 1]") {
    val out = graft.operators.Analytics.stickinessRatio(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val s = r.getAs[Double]("stickiness")
      val days = r.getAs[Long]("days_obs")
      assert(s > 0.0 && s <= 1.0, s"week ${r.getString(0)}: stickiness $s")
      assert(s >= 1.0 / (days.toDouble * r.getAs[Long]("wau")),
        "dau_sum >= wau forces the floor")
    }
  }

  test("new_product_adoption cumulative curve ends at the sold catalog size") {
    val out = graft.operators.Reports.newProductAdoption(spark, TestSpark.sf)
      .orderBy("yr", "mo").collect()
    val sold = graft.core.Tables(spark, TestSpark.sf).lineitem
      .select($"l_partkey").distinct().count()
    assert(out.last.getAs[Long]("cum_parts") == sold)
    assert(out.map(_.getAs[Long]("n_new_parts")).sum == sold)
    val cums = out.map(_.getAs[Long]("cum_parts"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
  }

  test("session_abandonment reconciles with sessionize and bounds the rate") {
    val out = graft.operators.Commerce.sessionAbandonment(spark, TestSpark.sf).collect()
    val nSessions = out.map(_.getAs[Long]("n_sessions")).sum
    val total = graft.operators.Analytics.sessionize(spark, TestSpark.sf).count()
    assert(nSessions <= total)
    for (r <- out) {
      assert(r.getAs[Long]("n_abandoned") <= r.getAs[Long]("n_intent"))
      val rate = r.getAs[Double]("abandonment_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("permutation_test_value p-value is valid and obs_diff matches a direct computation") {
    val row = graft.operators.Stats.permutationTestValue(spark, TestSpark.sf).collect()(0)
    val p = row.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    assert(row.getAs[Long]("n_extreme") <= 20L)
    val ev = graft.core.Tables(spark, TestSpark.sf).events
      .select($"event_type", expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    def mean(t: String): Double = {
      val r = ev.filter($"event_type" === t).agg(sum($"c"), count(lit(1))).collect()(0)
      r.getLong(0).toDouble / r.getLong(1).toDouble
    }
    val direct = (mean("purchase") - mean("click")) / 100.0
    assert(math.abs(row.getAs[Double]("obs_diff") - direct) < 1e-10)
  }

  test("holt_forecast weights extrapolate a ramp beyond its last value (trend-awareness)") {
    val w = graft.operators.Stats.HoltW
    assert(w.sum > 0, "weight mass must be positive for the renormalized filter")
    // recent lags weigh positive, the distant tail NEGATIVE — that sign
    // structure IS trend extrapolation (an EWMA has no negative tail)
    assert(w.head > 0 && w.last < 0)
    // on a rising ramp y_{t-k} = 100 - k the filter must forecast ABOVE
    // the last observation, where any positive-weight average cannot
    val ramp = (0 until w.length).map(k => BigDecimal(100 - k))
    val fc = (w, ramp).zipped.map((wi, y) => BigDecimal(wi) * y).sum / BigDecimal(w.sum)
    assert(fc > BigDecimal(100), s"ramp forecast $fc must exceed the last value 100")
    val out = graft.operators.Stats.holtForecast(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    for (r <- out) assert(!r.getAs[Double]("holt_forecast").isNaN)
  }

  test("multimodal_dedup groups planted byte-identical payloads under the min-id canonical") {
    val tmp = Files.createTempDirectory("graft_mmdedup").toString
    Seq((1L, "same bytes", "a"), (2L, "same bytes", "b"), (3L, "different", "c"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val out = graft.operators.Multimodal.multimodalDedup(spark, tmp).collect()
    assert(out.length == 1, "exactly one duplicate group planted")
    assert(out(0).getAs[Long]("n_copies") == 2L)
    assert(out(0).getAs[Long]("canonical_doc_id") == 1L)
    assert(out(0).getAs[String]("doc_ids") == "1,2")
    // and the real sf0.001 corpus has no byte-identical pair — the
    // 0-row result is the data, not a broken operator
    assert(graft.operators.Multimodal.multimodalDedup(spark, TestSpark.sf).count() == 0)
  }

  test("diff_in_diff regional effects cancel in aggregate") {
    val out = graft.operators.Stats.diffInDiff(spark, TestSpark.sf).collect()
    assert(out.length == 5, "one row per treatment region")
    // the five treated-vs-rest contrasts are linear in the same cell
    // means; a uniform shift in every region would zero all of them
    for (r <- out) {
      assert(r.getAs[Long]("n_ta") > 0 && r.getAs[Long]("n_tp") > 0)
      assert(!r.getAs[Double]("did_mean_value").isNaN)
    }
  }

  test("cuped_adjustment theta and variance reduction are consistent") {
    val row = graft.operators.Stats.cupedAdjustment(spark, TestSpark.sf).collect()(0)
    val red = row.getAs[Double]("var_reduction_pct")
    assert(red >= 0.0 && red <= 100.0, s"rho^2 out of range: $red")
    assert(!row.getAs[Double]("theta").isNaN)
    assert(row.getAs[Long]("n_customers") ==
      graft.core.Tables(spark, TestSpark.sf).orders
        .select($"o_custkey").distinct().count())
  }

  test("popularity_fallback_recs ranks recent bestsellers with a dormant audience") {
    val out = graft.operators.Analytics.popularityFallbackRecs(spark, TestSpark.sf)
      .orderBy("rank").collect()
    assert(out.length == 10)
    val counts = out.map(_.getAs[Long]("n_recent_lines"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "fallback list must be popularity-ordered")
    assert(out.map(_.getAs[Long]("n_dormant_customers")).distinct.length == 1)
  }

  test("XML source round-trips a typed frame through the built-in Spark 4 XML format") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft_xml").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType)))
    val df = Seq((1L, "alpha", 9.5), (2L, "beta", 12.25))
      .toDF("id", "name", "price")
    graft.sources.GraftSources.writeXml(df, s"$tmp/items", "item")
    val back = graft.sources.GraftSources.xml(spark, s"$tmp/items", schema, "item")
    assert(back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 9.5), (2L, "beta", 12.25)))
  }

  test("dedup_cross_source_matrix cells account for every LSH pair exactly once") {
    val matrix = graft.operators.Dedup.dedupCrossSourceMatrix(spark, TestSpark.sf).collect()
    val total = matrix.map(_.getAs[Long]("n_dup_pairs")).sum
    val pairs = graft.operators.Dedup.dedupMinHashLsh(spark, TestSpark.sf).count()
    assert(total == pairs, s"matrix total $total must equal pair count $pairs")
    for (r <- matrix)
      assert(r.getString(0) <= r.getString(1), "cells must be canonicalized")
  }

  test("lang_mix_by_source shares sum to 1 per source and docs reconcile") {
    val out = graft.operators.TextAnalysis.langMixBySource(spark, TestSpark.sf).collect()
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == graft.core.Tables(spark, TestSpark.sf).documents.count())
    for ((_, rs) <- out.groupBy(_.getString(0))) {
      val share = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 1e-9, s"shares must partition: $share")
    }
  }

  test("lsh_bucket_occupancy bounds the realized candidate volume per band") {
    val occ = graft.operators.Dedup.lshBucketOccupancy(spark, TestSpark.sf).collect()
    val nDocs = graft.core.Tables(spark, TestSpark.sf).documents.count()
    assert(occ.length == 16, "one row per LSH band")
    for (r <- occ) {
      assert(r.getAs[Long]("n_docs") == nDocs, "every doc lands in every band")
      assert(r.getAs[Long]("max_bucket") <= r.getAs[Long]("n_docs"))
    }
    // the per-band pair bounds must cover every surviving LSH pair
    val bound = occ.map(_.getAs[Long]("candidate_pairs")).sum
    val survivors = graft.operators.Dedup.dedupMinHashLsh(spark, TestSpark.sf).count()
    assert(bound >= survivors,
      s"candidate bound $bound cannot be below surviving pairs $survivors")
  }

  test("mde_sample_size is monotone in the MDE and matches the float formula to 1") {
    val out = graft.operators.Stats.mdeSampleSize(spark, TestSpark.sf)
      .orderBy("mde_bps").collect()
    assert(out.length == 3)
    val arms = out.map(_.getAs[Long]("n_per_arm"))
    assert(arms.zip(arms.tail).forall { case (a, b) => a >= b },
      "a bigger detectable effect needs fewer samples")
    for (r <- out) {
      val p = r.getAs[Double]("baseline_rate")
      assert(p > 0.0 && p < 1.0)
      val delta = r.getAs[Int]("mde_bps").toDouble / 10000.0
      val float = math.ceil(7.6832 * p * (1 - p) / (delta * delta))
      assert(math.abs(r.getAs[Long]("n_per_arm").toDouble - float) <= 1.0,
        s"integer ceil drifted from the formula: ${r.getAs[Long]("n_per_arm")} vs $float")
    }
  }

  test("supplier_scorecard reconciles lines and revenue share sums to 1") {
    val out = graft.operators.Reports.supplierScorecard(spark, TestSpark.sf).collect()
    val li = graft.core.Tables(spark, TestSpark.sf).lineitem
    assert(out.map(_.getAs[Long]("n_lines")).sum == li.count())
    val share = out.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
    for (r <- out) {
      val rate = r.getAs[Double]("return_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("embedding_top_eigen matches an independent all-integer power iteration exactly") {
    val out = graft.operators.Ann.embeddingTopEigen(spark, TestSpark.sf)
      .orderBy("dim").collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Long]("loading_q3")).toMap
    assert(out.values.map(math.abs).max == 1000L, "inf-norm fixpoint must be 1000")
    // independent re-derivation: same quantized pipeline in plain Scala
    val vecs = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(f => math.floor(f.toDouble * 1e6).toLong).toArray)
    val dims = vecs.head.length
    val c = Array.ofDim[Long](dims, dims)
    for (q <- vecs; a <- 0 until dims; b <- 0 until dims) c(a)(b) += q(a) * q(b)
    def sdiv(x: Long, d: Long): Long = if (x < 0) -((-x) / d) else x / d
    for (a <- 0 until dims; b <- 0 until dims) c(a)(b) = sdiv(c(a)(b), 1000000L)
    var v = Array.fill(dims)(1000L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dims)(a => (0 until dims).map(b => c(a)(b) * v(b)).sum)
      val m = w.map(math.abs).max
      v = w.map(x => sdiv(x * 1000L, m))
    }
    for (d <- 0 until dims)
      assert(out(d) == v(d), s"dim $d: operator ${out(d)} vs reference ${v(d)}")
  }

  test("compaction_plan conserves rows, keeps file_ids contiguous, fills all but the last file") {
    val t = graft.core.Tables(spark, TestSpark.sf)
    val out = graft.operators.Incremental.compactionPlan(spark, TestSpark.sf)
      .collect().sortBy(_.getAs[Long]("file_id"))
    val total = out.map(_.getAs[Long]("rows")).sum
    assert(total == t.events.count(), "row conservation")
    assert(out.map(_.getAs[Long]("file_id")).toSeq == out.indices.map(_.toLong),
      "file ids must be contiguous from 0")
    val target = graft.operators.Incremental.CompactionTargetRows
    var cum = 0L
    for ((r, i) <- out.zipWithIndex) {
      cum += r.getAs[Long]("rows")
      if (i < out.length - 1)
        assert(cum >= (r.getAs[Long]("file_id") + 1) * target,
          s"file ${r.getAs[Long]("file_id")} underfilled but not last")
    }
  }
}
