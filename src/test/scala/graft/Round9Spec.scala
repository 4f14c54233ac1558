package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 pins: VERDICT r8's two `weak` scale designs closed
  * (active_users_hll's always-on exact audit; knn_graph's pinned-k
  * pair shuffle) plus the approx percentile variants.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  // Generate nodes counted on the OPTIMIZED LOGICAL plan: the AQE
  // executed-plan string elides reused query-stage subtrees, so a
  // textual count over it undercounts (an InMemoryRelation leaf also
  // correctly hides the cached register build below the explode)
  private def generateCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.length

  test("active_users_hll production path fans out ONLY the register table") {
    // audit=false is the library default: the single Generate in the
    // plan is the days×64 register explode — the user-day frame (which
    // the audit countDistincts over a 7× fan-out) must NOT appear
    val prod = graft.operators.Sketches.activeUsersHll(spark, sf)
    val generates = generateCount(prod)
    assert(generates == 1,
      s"register-only path must carry exactly one explode, found $generates")
    prod.collect()
    val plan = prod.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("events".r.findAllIn(plan).length <= 1,
      s"one raw pass builds the registers:\n$plan")
    // the audit path (oracle entry) carries the second, user-sized
    // fan-out — the contrast that proves the gate is live
    assert(generateCount(
      graft.operators.Sketches.activeUsersHll(spark, sf, audit = true)) == 2,
      "audit path explodes registers AND user-days")
    graft.core.OwnedCaches.release()
  }

  test("kmKFor scales cells with the corpus but floors at the oracle's 8") {
    import graft.operators.Ann
    // every driver test scale sits at the floor — oracles unchanged
    assert(Ann.kmKFor(500) == 8)   // sf0.01 embeddings
    assert(Ann.kmKFor(5000) == 8)  // sf0.1 embeddings
    assert(Ann.kmKFor(8000) == 8)
    // beyond the floor, cells stay ~KmTargetCellSize-sized
    assert(Ann.kmKFor(100000) == 100)
    assert(Ann.kmKFor(1000000000L) == 1000000)
  }

  test("knn pair join scales its key count with forced large k") {
    import graft.operators.Ann
    // force k=32 on the 500-vector test corpus: the pair equi-join on
    // `cl` must see >8 distinct keys (the at-scale fix for VERDICT r8
    // weak #2 — reduce tasks grow with the corpus, never pin at 8)
    val (assigned, _, _, n) = Ann.kmeansAssign(spark, sf, kOverride = Some(32))
    assert(n > 0)
    val cells = assigned.select("cl").distinct().count()
    assert(cells > 8, s"forced k=32 should occupy >8 cells, got $cells")
    // the forced-shuffle branch (the above-cap path) stays a pair
    // EQUI-join — no cartesian, no broadcast of the resident side —
    // and still produces a well-formed graph
    val g = Ann.knnGraph(spark, sf, kOverride = Some(32), forceShuffle = true)
    g.collect()
    val plan = g.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"))
    val rows = g.collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.values.forall(_.length <= 3))
    // ranks are 1..k contiguous per vector
    byVec.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
    }
  }

  test("operator-owned caches release back to baseline storage") {
    import graft.core.OwnedCaches
    // drain anything earlier suites left registered, then snapshot
    OwnedCaches.release()
    spark.catalog.clearCache()
    // warm the SESSION-shared frames (Graph.supportEdges and the
    // Commerce.brandBaskets basket build — both survive release() by
    // design, like the dedup shingles) so they sit INSIDE the
    // baseline; the loop below then plan-matches them instead of
    // re-registering
    graft.operators.Graph.bfsHops(spark, sf).collect()
    graft.operators.Commerce.basketLift(spark, sf).collect()
    // round 18: the customer–supplier pair frame pagerank reads is
    // session-shared too (custSuppPairs) — warm it into the baseline
    graft.operators.Graph.pagerankTopk(spark, sf).collect()
    OwnedCaches.release()
    Thread.sleep(500)
    val baseline = spark.sparkContext.getPersistentRDDs.size
    // one representative per touched OWNED cache family: sketch
    // registers, bitmap words, fill-forward obs, drift bins, basket
    // sets, graph edge lists. SESSION-SHARED frames (dedup shingles,
    // the kmeans quantized corpus — annotated at their cache sites)
    // are deliberately absent: they survive release() by design.
    // THUNKS, not DataFrames: own() registers at operator-INVOCATION
    // time, so building all ten frames up front would register every
    // cache before the loop and the first release() would drain them
    // all — each operator must run inside its own own/release window,
    // exactly as Verify/Bench drive it
    val ops: Seq[() => org.apache.spark.sql.DataFrame] = Seq(
      () => graft.operators.Sketches.activeUsersHll(spark, sf),
      () => graft.operators.Sketches.hllRollup(spark, sf),
      () => graft.operators.Sketches.bitmapDistinct(spark, sf),
      () => graft.operators.Reports.fillForward(spark, sf),
      () => graft.etl.QualityChecks.distDrift(spark, sf),
      // basket_lift moved to the warm section above: its basket build
      // is session-shared (un-owned) since round 12
      () => graft.operators.Graph.bfsHops(spark, sf),
      // forceDistributed: the r14 replay branch owns no caches (it
      // reads only the session-shared support frame); the owned
      // degEdges cache under test belongs to the at-scale branch
      () => graft.operators.Graph.triangleCount(spark, sf, forceDistributed = true),
      // round 18: the replay branch owns nothing (it reads only the
      // session-shared pair/degree/flat frames) — the owned edge and
      // state caches under test belong to the forced-loop branch
      () => graft.operators.Graph.pagerank(spark, sf,
        forceCopartition = false, forceLoop = true))
    ops.foreach { op =>
      op().collect()
      assert(OwnedCaches.pendingCount > 0,
        "operator should have registered owned caches before materializing")
      OwnedCaches.release()
    }
    // released caches unwind asynchronously (blocking = false)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var now = spark.sparkContext.getPersistentRDDs.size
    while (now > baseline && System.nanoTime() < deadline) {
      Thread.sleep(200); now = spark.sparkContext.getPersistentRDDs.size
    }
    assert(now <= baseline,
      s"owned caches leaked: $now persistent RDDs vs baseline $baseline")
  }

  test("stats family invariants hold") {
    import graft.operators.Stats
    val ks = Stats.ksTest(spark, sf).collect()
    assert(ks.length == 10)
    assert(ks.forall { r =>
      val d = r.getAs[Double]("d_stat"); d >= 0.0 && d <= 1.0 })

    val mw = Stats.mannWhitney(spark, sf).collect().head
    val (na, nb) = (mw.getAs[Long]("n_a"), mw.getAs[Long]("n_b"))
    // U_a + U_b = n_a·n_b — the rank-sum identity, exact
    assert(mw.getAs[Double]("u_a") + mw.getAs[Double]("u_b") == (na * nb).toDouble)

    val chi = Stats.chiSquareProfile(spark, sf).collect()
    assert(chi.length == 10)
    // observed and expected tables carry the same mass
    val obsSum = chi.map(_.getAs[Long]("observed")).sum.toDouble
    val expSum = chi.map(_.getAs[Double]("expected")).sum
    assert(math.abs(obsSum - expSum) < 1e-6)
    assert(chi.head.getAs[Double]("chi2") >= 0.0)

    val reg = Stats.regressionTrend(spark, sf).collect().head
    val r2 = reg.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)

    val acf = Stats.autocorrLag(spark, sf).collect()
    assert(acf.map(_.getAs[Int]("lag")).toSeq == (1 to 7))
    assert(acf.forall { r =>
      val a = r.getAs[Double]("acf"); a >= -1.0 && a <= 1.0 })

    // transition rows sum to 1 per source state
    Stats.markovTransitions(spark, sf).collect()
      .groupBy(_.getAs[String]("from_type"))
      .foreach { case (_, rs) =>
        assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9) }

    val ben = Stats.benfordDeviation(spark, sf).collect()
    assert(math.abs(ben.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-9)

    val si = Stats.seasonalIndex(spark, sf).collect()
    // day-weighted mean of the indices is exactly 1 by construction
    val wmean = si.map(r => r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days")).sum /
      si.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(wmean - 1.0) < 1e-9)
  }

  test("sketch-space intersect tracks the exact bitmap intersect") {
    import graft.operators.Sketches
    val exact = Sketches.bitmapIntersect(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_intersect")).toMap
    val est = Sketches.hllIntersect(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_intersect")).toMap
    assert(exact.keySet == est.keySet && exact.size == 10)
    // inclusion–exclusion compounds the per-set error (~1.04/√64 ≈ 13%
    // each, three estimates) — 50% is the loose sanity band that still
    // catches a broken union merge (which lands orders of magnitude off)
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex) <= math.max(0.5 * ex, 40.0),
        s"pair $k: est ${est(k)} vs exact $ex")
    }
    graft.core.OwnedCaches.release()
  }

  test("features family invariants hold") {
    import graft.operators.Features
    val oh = Features.oneHotTopk(spark, sf).collect()
    // exactly one indicator fires per row
    assert(oh.forall { r =>
      (1 to 5).map(k => r.getAs[Int](s"oh_$k")).sum + r.getAs[Int]("oh_other") == 1 })

    val fs = Features.featureScale(spark, sf).collect()
    assert(fs.forall { r =>
      val m = r.getAs[Double]("minmax"); m >= 0.0 && m <= 1.0 })

    val dl = Features.decileLift(spark, sf).collect()
    assert(dl.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    // lift is conversion-mass-weighted to 1 across deciles:
    // Σ n_conv = conv_all and Σ n_cust = n_all by construction
    val nAll = dl.map(_.getAs[Long]("n_cust")).sum
    val convAll = dl.map(_.getAs[Long]("n_conv")).sum
    dl.foreach { r =>
      val expect = r.getAs[Long]("n_conv").toDouble * nAll /
        (r.getAs[Long]("n_cust") * convAll)
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-12) }

    val sh = Features.survivalHazard(spark, sf).collect()
    // at_risk telescopes: risk set at t = churned(t) + risk set at t+1
    sh.sortBy(_.getAs[Int]("tenure")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("at_risk") - a.getAs[Long]("churned") ==
          b.getAs[Long]("at_risk"))
      case _ => ()
    }
    assert(sh.forall { r =>
      val h = r.getAs[Double]("hazard"); h > 0.0 && h <= 1.0 })
  }

  test("lifecycle/attribution family invariants hold") {
    import graft.operators.{Commerce, Graph}
    // attribution reconciles: the table totals to gross purchase value
    // (rounding loses < 1e-4 cents per split by construction)
    val att = Commerce.attributionLinear(spark, sf).collect()
    val attTotal = att.map(_.getAs[Double]("attributed_revenue")).sum
    val gross = graft.core.Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(attTotal - gross) < 0.01,
      s"attribution leaked revenue: $attTotal vs gross $gross")

    // cohort LTV is cumulative: nondecreasing within each cohort
    Commerce.cohortLtv(spark, sf).collect()
      .groupBy(_.getAs[Int]("cohort_month")).foreach { case (_, rs) =>
        val cum = rs.sortBy(_.getAs[Int]("offset_months"))
          .map(_.getAs[Double]("cum_revenue"))
        assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
      }

    val ttc = Commerce.timeToConvert(spark, sf).collect().head
    assert(ttc.getAs[Long]("n_converted") <= ttc.getAs[Long]("n_signup"))
    assert(ttc.getAs[Double]("p50_latency_s") <= ttc.getAs[Double]("p90_latency_s"))

    // degree shares total 1; zipf ranks are contiguous with freq desc
    val dp = Graph.degreeProfile(spark, sf).collect()
    assert(math.abs(dp.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val zp = graft.operators.TextAnalysis.zipfProfile(spark, sf).collect()
    assert(zp.map(_.getAs[Int]("rank")).toSeq == (1 to zp.length))
    val freqs = zp.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => b <= a })

    // rolling anomalies are a (strict) subset of the day grid and all |z|>3
    val ar = graft.operators.Stats.anomalyRolling(spark, sf).collect()
    assert(ar.nonEmpty && ar.forall(r => math.abs(r.getAs[Double]("roll_z")) > 3.0))
    graft.core.OwnedCaches.release()
  }

  test("streaming register-space rollup equals the batch sketch at every grain") {
    import graft.streaming.{EventStream, HllSink}
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_rin").toString
    val st = Files.createTempDirectory("graft_rst").toString
    def ev(id: Long, user: Long, typ: String): String =
      s"""{"event_id":$id,"ts_us":${id * 1000},"user_id":$user,"event_type":"$typ","value":1.0}"""
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      (1 to 60).map(i => ev(i, i % 23, if (i % 2 == 0) "view" else "click")).mkString("\n"))
    val q = HllSink.start(spark, in, st)
    try {
      q.processAllAvailable()
      Files.writeString(Paths.get(s"$in/b2.jsonl"),
        (40 to 120).map(i => ev(i, i % 37, if (i % 3 == 0) "buy" else "click")).mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()
    // batch reference over ALL input through the same derivation
    val ref = Files.createTempDirectory("graft_rref").toString
    HllSink.registers(spark.read.schema(EventStream.eventSchema).json(in))
      .write.parquet(s"$ref/v0")
    val streamed = HllSink.rollupEstimate(spark, st)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = HllSink.rollupEstimate(spark, ref)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // every grain — the 3 types AND the register-merged ALL row —
    // bit-identical to the batch sketch over the concatenated input
    assert(streamed.keySet == Set("ALL", "buy", "click", "view"))
    assert(streamed == direct,
      s"register-space rollup diverged: $streamed vs $direct")
    // the ALL row never touched raw events: it derives from ≤ 3×64
    // state rows (boundedness is the whole point)
    assert(HllSink.currentRegisters(spark, st).count() <= 3 * 64)
  }

  test("round-9 operator plans have the intended shapes") {
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    // ks_test: the raw log is scanned ONCE (the conditional-count
    // pivot); no cartesian anywhere
    val ks = planOf(graft.operators.Stats.ksTest(spark, sf))
    assert("events".r.findAllIn(ks).length <= 1, s"ks_test rescans raw:\n$ks")
    assert(!ks.contains("CartesianProduct"))

    // attribution: user-keyed equi-join with the time band as a
    // residual — never a cartesian/nested-loop
    val at = planOf(graft.operators.Commerce.attributionLinear(spark, sf))
    assert(!at.contains("CartesianProduct") && !at.contains("BroadcastNestedLoopJoin"),
      s"attribution degenerated to a non-equi join:\n$at")

    // feature_scale: the corpus side joins its 3-row moments by
    // BROADCAST — no shuffle of the scaled side
    val fs = planOf(graft.operators.Features.featureScale(spark, sf))
    assert(fs.contains("BroadcastHashJoin"), s"feature_scale lost its broadcast:\n$fs")

    // bitmap_intersect: word-space equi-join; the raw log feeds ONE
    // word build (cached, read by totals + pair join)
    val bi = planOf(graft.operators.Sketches.bitmapIntersect(spark, sf))
    assert(!bi.contains("CartesianProduct"))

    // welch_t_test: ONE pass over the raw log builds every moment —
    // the 10 pairs are driver-side literal expansion, no self-join
    val wt = planOf(graft.operators.Stats.welchTTest(spark, sf))
    assert("events".r.findAllIn(wt).length <= 1, s"welch rescans raw:\n$wt")
    assert(!wt.contains("Join"), s"welch should be join-free:\n$wt")

    // trailing_spend_90d: user-keyed equi-join (band residual), never
    // a nested-loop over events×orders
    val ts = planOf(graft.operators.Reports.trailingSpend90d(spark, sf))
    assert(!ts.contains("CartesianProduct") && !ts.contains("BroadcastNestedLoopJoin"),
      s"trailing spend degenerated:\n$ts")

    // conversion_wilson_ci / lorenz: dim-side aggregation, scan prunes
    // to the 2-3 referenced columns
    val wc = graft.operators.Reports.conversionWilsonCi(spark, sf)
    val scan = wc.queryExecution.executedPlan.toString
    assert(scan.contains("o_custkey") && !scan.contains("o_totalprice"),
      "wilson reads only the custkey from orders")

    // daily_revenue_gapfill: the spine joins by BROADCAST (day spine
    // is bounded at any SF)
    val gf = planOf(graft.operators.Reports.dailyRevenueGapfill(spark, sf))
    assert(gf.contains("BroadcastHashJoin") || gf.contains("BroadcastExchange"),
      s"gapfill spine must broadcast:\n$gf")
    graft.core.OwnedCaches.release()
  }

  test("timeseries/funnel batch invariants hold") {
    import graft.operators.{Commerce, Reports, Stats}
    val xc = Stats.crosscorrLag(spark, sf).collect()
    assert(xc.map(_.getAs[Int]("lag")).toSeq == (-3 to 3))
    assert(xc.forall { r =>
      val v = r.getAs[Double]("xcorr"); v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12 })
    // lag 0 of cross-corr IS the Pearson r of the two aligned series
    val ev = graft.core.Tables(spark, sf).events
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("CAST(timestamp_micros(ts_us) AS DATE)").as("d"))
      .pivot("event_type", Seq("click", "purchase"))
      .agg(sum(expr("CAST(value AS DECIMAL(18,2))")))
      .na.drop()
    val pearson = ev.agg(corr(col("click"), col("purchase"))).collect().head.getDouble(0)
    val lag0 = xc.find(_.getAs[Int]("lag") == 0).get.getAs[Double]("xcorr")
    assert(math.abs(lag0 - pearson) < 1e-10, s"lag0 $lag0 vs pearson $pearson")

    val cp = Stats.changepointDetect(spark, sf).collect().head
    assert(cp.getAs[Double]("sse_gain") >= 0.0)
    assert(cp.getAs[Long]("n_before") > 0 && cp.getAs[Long]("n_after") > 0)

    val fw = Commerce.funnelWindowed(spark, sf).collect().head
    assert(fw.getAs[Long]("n_signup") >= fw.getAs[Long]("n_click_24h"))
    assert(fw.getAs[Long]("n_click_24h") >= fw.getAs[Long]("n_purchase_24h"))
    assert(fw.getAs[Long]("n_purchase_24h") > 0)

    val iqr = Reports.iqrOutliers(spark, sf).collect()
    assert(iqr.nonEmpty && iqr.forall { r =>
      r.getAs[Double]("value") < r.getAs[Double]("lo_fence") ||
        r.getAs[Double]("value") > r.getAs[Double]("hi_fence") })
  }

  test("sql-surface batch invariants hold") {
    import graft.operators.{Reports, SqlSurfaces}
    // nearest-asof picks whichever of the backward/forward matches is
    // closer — cross-checked against the two oracled siblings
    val near = SqlSurfaces.asofEventOrderNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("nearest_order_ts_us"), r.getAs[String]("side"))).toMap
    val back = Reports.asofEventOrder(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_order_ts_us")).map(_.toLong)).toMap
    val fwd = Reports.asofEventOrderForward(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_order_ts_us")).map(_.toLong)).toMap
    val evTs = graft.core.Tables(spark, sf).events
      .select(col("event_id"), col("ts_us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    near.foreach { case (eid, (nts, side)) =>
      val t = evTs(eid)
      val dPrev = back(eid).map(p => t - p)
      val dNext = fwd(eid).map(n => n - t)
      val dNear = if (side == "prev") dPrev.get else dNext.get
      assert(nts == (if (side == "prev") back(eid).get else fwd(eid).get))
      assert(dPrev.forall(dNear <= _) || side == "prev")
      assert(dNext.forall(dNear <= _) || side == "next")
      // winner is genuinely the minimum of the two candidate distances
      assert(dNear == Seq(dPrev, dNext).flatten.min)
    }

    // percentile_disc returns ACTUAL data values
    val vals = graft.core.Tables(spark, sf).events
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    SqlSurfaces.percentileDiscProfile(spark, sf).collect().foreach { r =>
      val s = vals(r.getString(0))
      assert(s.contains(r.getAs[Double]("p50_disc")))
      assert(s.contains(r.getAs[Double]("p90_disc")))
    }

    // unpivot emits |groups| × |metrics| rows
    assert(SqlSurfaces.unpivotMetrics(spark, sf).count() == 3 * 3)

    // grouping sets: exactly the named sets appear (gid 0, 1, 3 — not
    // cube's priority-only set gid 2)
    val gids = SqlSurfaces.groupingSetsProfile(spark, sf).collect()
      .map(_.getAs[Int]("gid")).toSet
    assert(gids == Set(0, 1, 3), s"unexpected grouping ids $gids")
  }

  test("growth/abc/pvm batch invariants hold") {
    import graft.operators.Reports
    // ABC: cumulative share nondecreasing, ends at 1, classes ordered
    val abc = Reports.abcClassification(spark, sf).collect()
    val shares = abc.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(math.abs(shares.last - 1.0) < 1e-12)
    val classSeq = abc.map(_.getAs[String]("abc_class")).distinct.toSeq
    assert(classSeq == Seq("A", "B", "C"))

    // price + volume effects reconcile to the revenue delta exactly
    // (up to the 1e-6 float wobble of the p=rev/qty division)
    Reports.priceVolumeMix(spark, sf).collect().foreach { r =>
      val sum = r.getAs[Double]("price_effect") + r.getAs[Double]("volume_effect")
      assert(math.abs(sum - r.getAs[Double]("delta_rev")) < 1e-6,
        s"${r.getString(0)}: bridge does not reconcile")
    }

    // new + returning = DAU (cross-checked against active_users_window)
    val nvr = Reports.newVsReturning(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("new_users") + r.getAs[Long]("returning_users"))).toMap
    graft.operators.Commerce.activeUsersWindow(spark, sf).collect().foreach { r =>
      assert(nvr(r.getString(0)) == r.getAs[Long]("dau"))
    }

    // growth table: revenue positive, growth defined wherever a base
    // month exists (dense month spine)
    val g = Reports.growthMomYoy(spark, sf).collect()
    assert(g.forall(_.getAs[Double]("revenue") > 0))
    assert(g.drop(1).forall(r => !r.isNullAt(r.fieldIndex("mom_growth"))))
    assert(g.drop(12).forall(r => !r.isNullAt(r.fieldIndex("yoy_growth"))))
  }

  test("SpaceSaving heavy hitters: bounds and coverage hold under partitioned merge") {
    graft.functions.SpaceSaving.register(spark)
    val sess = spark
    import sess.implicits._
    // skewed synthetic: 5 heavy keys × 400, 45 tail keys × 10 —
    // heavy freq (400) > 2n/k (2·2450/16 ≈ 306), so coverage is owed
    val rows = (0L until 50L).flatMap(i => Seq.fill(if (i < 5) 400 else 10)(i))
    val out = rows.toDF("k").repartition(8) // force multi-buffer merges
      .agg(expr("graft_spacesaving(16, k)").as("hh"))
      .selectExpr("explode(hh) AS h")
      .select(col("h.key"), col("h.est"), col("h.err"))
      .collect()
    assert(out.length <= 16)
    val trueCnt = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    out.foreach { r =>
      val t = trueCnt.getOrElse(r.getLong(0), 0L)
      // est ∈ [true, true + err] — the SpaceSaving invariant, which
      // the mergeable-summaries combine must preserve
      assert(r.getLong(1) >= t && r.getLong(1) - r.getLong(2) <= t,
        s"key ${r.getLong(0)}: est ${r.getLong(1)} err ${r.getLong(2)} true $t")
    }
    val thresh = 2.0 * rows.size / 16
    trueCnt.filter(_._2 > thresh).keys.foreach { hk =>
      assert(out.exists(_.getLong(0) == hk), s"heavy key $hk missing")
    }
  }

  test("built-in session_window matches the custom sessionizer session-for-session") {
    // session_window is the streaming-native sessionization operator;
    // its batch face must reproduce the oracled sessionize exactly
    // (both use a 30-min gap; session_window splits at gap ≥ 30min vs
    // sessionize's > — indistinguishable on µs-grain data)
    val ev = graft.core.Tables(spark, sf).events
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("t"))
    val sw = ev.groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))
    val custom = graft.operators.Analytics.sessionize(spark, sf)
      .select(col("user_id"), col("session_start_us").as("start_us"),
        col("n_events"))
    assert(sw.exceptAll(custom).isEmpty && custom.exceptAll(sw).isEmpty,
      "session_window diverged from sessionize")
  }

  test("active_users_hll production estimates equal the audited estimates") {
    val prod = graft.operators.Sketches.activeUsersHll(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("wau7_estimate")).toMap
    val audited = graft.operators.Sketches.activeUsersHll(spark, sf, audit = true)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("wau7_estimate")).toMap
    assert(prod == audited)
  }

  // ------------------------------------------------------ batch-7 invariants

  test("connected_components: unrolled depth reaches the fixpoint and partitions the node set") {
    import graft.operators.Graph
    val before = Graph.ccLabels(spark, sf, Graph.CcRounds - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = Graph.ccLabels(spark, sf, Graph.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == after, "one more round must change nothing — CcRounds is sufficient depth")
    // component sizes partition the labeled node set exactly
    val hist = Graph.connectedComponents(spark, sf).collect()
    assert(hist.map(_.getLong(1)).sum == after.size)
    // every component id is a member of its own component (min-label is a node)
    assert(hist.forall(r => after(r.getLong(0)) == r.getLong(0)))
    graft.core.OwnedCaches.release()
  }

  test("tv_distance_drift: contributions are a bounded probability gap and match a brute recount") {
    val rows = graft.operators.Stats.tvDistanceDrift(spark, sf).collect()
    val total = rows.map(_.getAs[Double]("tv_contrib")).sum
    assert(total >= 0.0 && total <= 1.0, s"TV distance must sit in [0,1], got $total")
    // brute-force recount from raw events
    val ev = graft.core.Tables(spark, sf).events
      .select(col("event_type"), col("ts_us")).collect()
    val mid = {
      val ts = ev.map(_.getLong(1)); math.floorDiv(ts.min + ts.max, 2) +
        (if (math.floorMod(ts.min + ts.max, 2) != 0 && (ts.min + ts.max) < 0) 0L else 0L)
    }
    val byType = ev.groupBy(_.getString(0))
    val totA = ev.count(_.getLong(1) <= mid).toLong
    val totB = ev.length - totA
    rows.foreach { r =>
      val es = byType(r.getString(0))
      val a = es.count(_.getLong(1) <= mid).toLong
      val b = es.length - a
      assert(r.getLong(1) == a && r.getLong(2) == b)
      val expect = math.abs(a * totB - b * totA).toDouble / (2.0 * totA * totB)
      assert(r.getAs[Double]("tv_contrib") == expect)
    }
  }

  test("theil_sen_trend: pair counts are exact M-choose-2 and the median sits within slope range") {
    val t = graft.core.Tables(spark, sf)
    val months = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(countDistinct(expr("year(o_orderdate) * 12 + month(o_orderdate)")).as("mn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.Stats.theilSenTrend(spark, sf).collect().foreach { r =>
      val m = months(r.getString(0))
      assert(r.getLong(1) == m * (m - 1) / 2, "n_pairs must be C(M,2)")
      assert(!r.getAs[Double]("ts_slope").isNaN)
    }
  }

  test("ewma_revenue: a region's first month has ewma == revenue; later months interpolate") {
    val rows = graft.operators.Stats.ewmaRevenue(spark, sf).collect()
      .groupBy(_.getString(0)).values
    rows.foreach { rs =>
      val sorted = rs.sortBy(r => (r.getInt(1), r.getInt(2)))
      val first = sorted.head
      assert(first.getAs[Double]("ewma") == first.getAs[Double]("revenue"),
        "lag-0-only month renormalizes to the plain revenue")
      // smoothing: ewma stays within the running min/max of observed revenue
      val revs = sorted.map(_.getAs[Double]("revenue"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = revs.slice(math.max(0, i - graft.operators.Stats.EwmaLags + 1), i + 1)
        assert(r.getAs[Double]("ewma") >= win.min - 1e-9 && r.getAs[Double]("ewma") <= win.max + 1e-9)
      }
    }
  }

  test("weighted_median: half the quantity mass sits at or below the reported price") {
    val li = graft.core.Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"),
        expr("CAST(l_quantity * 100 AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    graft.operators.Analytics.weightedMedian(spark, sf).collect().foreach { r =>
      val flag = r.getString(0); val med = r.getAs[Double]("wmedian_price")
      val fs = li.filter(_._1 == flag)
      val total = fs.map(_._3).sum
      val below = fs.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = fs.filter(_._2 < med).map(_._3).sum
      assert(below * 2 >= total, "at least half the mass at or below the median")
      assert(strictlyBelow * 2 < total, "median is the MINIMAL such price")
      assert(r.getAs[Long]("total_weight_x100") == total)
    }
  }

  test("transformWithState running profile accumulates exactly across micro-batches") {
    import graft.streaming.EventStream
    def writeBatch(dir: String, name: String, rows: Seq[EventStream.Ev]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map(e =>
          s"""{"event_id":${e.event_id},"ts_us":${e.ts_us},"user_id":${e.user_id},"event_type":"${e.event_type}","value":${e.value}}""")
          .mkString("\n"))
    val min = 60L * 1000000
    val tmp = java.nio.file.Files.createTempDirectory("graft_tws").toString
    writeBatch(tmp, "b1.jsonl", Seq(
      EventStream.Ev(1, 1 * min, 1, "click", 1.25),
      EventStream.Ev(2, 2 * min, 1, "view", 2.50),
      EventStream.Ev(3, 2 * min, 2, "click", 0.75)))
    val q = EventStream.runningProfileStream(spark, tmp).writeStream
      .outputMode("update").format("memory").queryName("tws_profile").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("tws_profile").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(r1(1L) == ((2L, 375L, 2 * min)), "user 1: 2 events, exact cents, last ts")
      assert(r1(2L) == ((1L, 75L, 2 * min)))
      // second micro-batch: state must carry, not restart
      writeBatch(tmp, "b2.jsonl", Seq(
        EventStream.Ev(4, 5 * min, 1, "purchase", 10.00)))
      q.processAllAvailable()
      val rows2 = spark.table("tws_profile").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows2.contains((3L, 1375L, 5 * min)),
        s"profile must accumulate across batches, got ${rows2.toSeq}")
    } finally q.stop()
  }

  test("batch-11 invariants: hashing trick, median centroid, backlog, near-dup orders") {
    // feature_hash_vectors: per-doc bucket counts repartition the token count
    val fh = graft.operators.Features.featureHashVectors(spark, sf).collect()
    assert(fh.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 64))
    val tokTotal = graft.core.Tables(spark, sf).documents
      .select(explode(graft.functions.GraftFunctions.normTokens(col("text"))))
      .count()
    assert(fh.map(_.getLong(2)).sum == tokTotal,
      "hashed bucket counts must conserve the token count")

    // embedding_median_centroid: median within [min, max] per coordinate
    val med = graft.operators.Ann.embeddingMedianCentroid(spark, sf).collect()
    val minmax = graft.core.Tables(spark, sf).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.get(0).asInstanceOf[Number].longValue, r.getInt(1)) ->
        ((r.getFloat(2), r.getFloat(3)))).toMap
    med.foreach { r =>
      val (lo, hi) = minmax((r.get(0).asInstanceOf[Number].longValue, r.getInt(1)))
      val m = r.getAs[Double]("median_coord")
      assert(m >= lo && m <= hi)
    }

    // open_order_backlog: conserves flow — every placed line ships
    val bl = graft.operators.Reports.openOrderBacklog(spark, sf).collect()
    assert(bl.last.getAs[Long]("backlog") == 0L,
      "flow conservation: every line appears in both series")
    // (the synthetic generator does NOT keep shipdate ≥ orderdate, so
    // intermediate backlog may legitimately dip negative here)
    assert(bl.exists(_.getAs[Long]("backlog") != 0L))

    // suspect_duplicate_orders: every reported pair satisfies both bands
    graft.operators.Commerce.suspectDuplicateOrders(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("day_gap") <= 7)
      val (p1, p2) = (r.getAs[Double]("price_1"), r.getAs[Double]("price_2"))
      assert(math.abs(p1 - p2) * 100 <= math.max(p1, p2) + 1e-6)
    }
  }

  test("batch-12 invariants: RRF recomputes from member ranks; trailing spend brute-recounts") {
    val fused = graft.operators.Ann.hybridRankFusion(spark, sf).collect()
    graft.core.OwnedCaches.release()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val (re, rl) = (Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int]))
      val expect = re.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rl.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect)
      assert(r.getAs[Int]("fused_rank") >= 1 && r.getAs[Int]("fused_rank") <= 5)
    }

    val ts = graft.operators.Reports.trailingSpend90d(spark, sf).collect()
    val orders = graft.core.Tables(spark, sf).orders
      .selectExpr("o_custkey", "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS oday",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val evDay = graft.core.Tables(spark, sf).events
      .selectExpr("event_id", "user_id", "CAST(ts_us div 86400000000 AS BIGINT) AS eday")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    ts.take(200).foreach { r =>
      val (user, eday) = evDay(r.getLong(0))
      val window = orders.filter(o => o._1 == user && o._2 >= eday - 90 && o._2 < eday)
      assert(r.getLong(2) == window.length, "n_orders recount")
      assert(r.getAs[Double]("spend_90d") == window.map(_._3).sum.toDouble / 100.0)
    }
  }

  test("revenue contribution decomposition reconciles and bands order correctly") {
    val rows = graft.operators.Reports.revenueContributionMom(spark, sf).collect()
    rows.groupBy(r => (r.getInt(0), r.getInt(1))).values.foreach { month =>
      val total = month.head.getAs[Double]("total_delta")
      val sum = month.map(_.getAs[Double]("region_delta")).sum
      assert(math.abs(sum - total) < 1e-6, "delta decomposition must reconcile")
      val contribs = month.flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Double]))
      if (contribs.nonEmpty && month.forall(r => r.get(5) != null))
        assert(math.abs(contribs.sum - 1.0) < 1e-9, "shares of the move sum to 1")
    }
    val qb = graft.operators.Reports.quantileBandsMonthly(spark, sf).collect()
    qb.foreach { r =>
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
    }
  }

  test("batch-13 invariants: gapfill spine, migration matrix, snaive baseline") {
    val gf = graft.operators.Reports.dailyRevenueGapfill(spark, sf).collect()
    // spine is DENSE: row count == day span, revenue conserves
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(gf.head.getString(0)),
      java.time.LocalDate.parse(gf.last.getString(0))) + 1
    assert(gf.length == span, s"dense spine: ${gf.length} rows vs $span days")
    val totalRev = graft.core.Tables(spark, sf).orders
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))"))).collect()(0).getDecimal(0)
    assert(math.abs(gf.map(_.getAs[Double]("revenue")).sum - totalRev.doubleValue()) < 1e-4)
    assert(gf.exists(_.getAs[Long]("was_missing") == 1L) ||
      gf.forall(_.getAs[Long]("was_missing") == 0L))

    val mig = graft.operators.Reports.segmentMigration(spark, sf).collect()
    // every customer lands in exactly one cell; row shares sum to 1
    val nCust = graft.core.Tables(spark, sf).orders
      .select(col("o_custkey")).distinct().count()
    assert(mig.map(_.getAs[Long]("n_customers")).sum == nCust)
    mig.groupBy(_.getInt(0)).values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    }

    val sb = graft.operators.Stats.snaiveBacktest(spark, sf).collect()
    assert(sb.nonEmpty)
    sb.foreach(r => assert(r.getAs[Double]("mape") >= 0.0 && r.getLong(1) > 0))
  }

  test("statestore source batch-reads the transformWithState checkpoint") {
    import graft.streaming.EventStream
    def writeBatch(dir: String, name: String, rows: Seq[EventStream.Ev]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
        rows.map(e =>
          s"""{"event_id":${e.event_id},"ts_us":${e.ts_us},"user_id":${e.user_id},"event_type":"${e.event_type}","value":${e.value}}""")
          .mkString("\n"))
    val min = 60L * 1000000
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssr_ckpt").toString
    writeBatch(tmp, "b1.jsonl", Seq(
      EventStream.Ev(1, 1 * min, 7, "click", 3.25),
      EventStream.Ev(2, 4 * min, 7, "view", 1.00),
      EventStream.Ev(3, 2 * min, 8, "click", 2.00)))
    val q = EventStream.runningProfileStream(spark, tmp).writeStream
      .outputMode("update").format("memory").queryName("ssr_profile")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    // the stream is stopped but its state survives in the checkpoint;
    // the batch source reads it back with the stream's own key/value
    // schema
    val state = graft.sources.GraftSources.readStateStore(spark, ckpt, Some("profile"))
    val rows = state.selectExpr("key.value AS user_id", "value.n", "value.cents", "value.last_us")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(7L) == ((2L, 425L, 4 * min)), s"got $rows")
    assert(rows(8L) == ((1L, 200L, 2 * min)))
  }

  test("traversal family: single-task branch equals the distributed loop branch") {
    import graft.operators.Graph
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(pairs(Graph.bfsHops(spark, sf)) == pairs(Graph.bfsHops(spark, sf, forceLoop = true)))
    assert(pairs(Graph.shortestPathBf(spark, sf)) ==
      pairs(Graph.shortestPathBf(spark, sf, forceLoop = true)))
    assert(pairs(Graph.connectedComponents(spark, sf)) ==
      pairs(Graph.connectedComponents(spark, sf, forceLoop = true)))
    graft.core.OwnedCaches.release()
  }

  test("recursive CTE reachability equals the unrolled bfs_hops operator") {
    import graft.operators.Graph
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.recursiveReachability(spark, sf)) == m(Graph.bfsHops(spark, sf)),
      "engine-iterated recursion and library-unrolled rounds must agree node-for-node")
    graft.core.OwnedCaches.release()
  }

  test("kcore peeling reaches its fixpoint and every survivor keeps k neighbors") {
    import graft.operators.Graph
    val five = Graph.kcoreNodes(spark, sf, rounds = Graph.KCoreRounds - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val six = Graph.kcoreNodes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(five == six, "one more peel must change nothing")
    assert(six.values.forall(_ >= Graph.KCoreK),
      "every surviving node keeps >= k surviving neighbors")
    // single-task branch == distributed loop branch
    val looped = Graph.kcoreNodes(spark, sf, forceLoop = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(looped == six)
    graft.core.OwnedCaches.release()
  }

  test("link prediction never proposes an existing edge and jaccard recomputes") {
    import graft.operators.Graph
    val top = Graph.linkPredictionJaccard(spark, sf).collect()
    graft.core.OwnedCaches.release()
    assert(top.nonEmpty)
    // rebuild neighborhoods brute-force
    val und = graft.core.Tables(spark, sf).lineitem
      .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("bs"))
      .select(explode(col("bs")).as("p1"), col("bs"))
      .select(col("p1"), explode(col("bs")).as("p2"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val edgeSet = und.toSet
    top.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(!edgeSet((a min b, a max b)), "proposed link must not already exist")
      val (na, nb) = (nbrs(a), nbrs(b))
      val common = (na & nb).size
      assert(r.getLong(2) == common)
      assert(r.getAs[Double]("jaccard") == common.toDouble / (na.size + nb.size - common))
    }
  }

  test("basket_triples: support never exceeds any pairwise sub-basket support") {
    val triples = graft.operators.Commerce.basketTriples(spark, sf).collect()
    graft.core.OwnedCaches.release()
    val t = graft.core.Tables(spark, sf)
    val baskets = t.lineitem
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_orderkey")).agg(collect_set(col("p_brand")).as("bs"))
      .collect().map(_.getSeq[String](1).toSet)
    triples.foreach { r =>
      val (b1, b2, b3) = (r.getString(0), r.getString(1), r.getString(2))
      assert(b1 < b2 && b2 < b3, "canonical ordering")
      val sup = baskets.count(s => s(b1) && s(b2) && s(b3))
      assert(r.getLong(3) == sup, "support recounts against raw baskets")
      assert(r.getAs[Double]("lift") > 0.0)
      val pairSup = baskets.count(s => s(b1) && s(b2))
      assert(sup <= pairSup, "anti-monotonicity")
    }
  }
}
