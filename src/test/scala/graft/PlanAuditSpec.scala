package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 plan-shape pins for the single-scan window rewrites: the
  * point of the q2/q17/q20 rewrite was ONE pass over lineitem — a
  * regression back to aggregate-then-join would re-introduce the
  * second scan silently, so pin the scan count in the executed plan.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // only the final plan reflects what actually ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q2/q17/q20 read lineitem exactly once") {
    import graft.operators.DecisionSupport
    // count occurrences of the lineitem path in the executed plan —
    // file scans embed the location, so the table name appears once
    // per scan operator
    def liScans(plan: String): Int = "lineitem".r.findAllIn(plan).length
    val q2 = executedPlan(DecisionSupport.q2MinCostSupplier(spark, sf))
    assert(liScans(q2) <= 1, s"q2 scans lineitem more than once:\n$q2")
    val q17 = executedPlan(DecisionSupport.q17SmallQuantity(spark, sf))
    assert(liScans(q17) <= 1, s"q17 scans lineitem more than once:\n$q17")
    val q20 = executedPlan(DecisionSupport.q20PartSupply(spark, sf))
    assert(liScans(q20) <= 1, s"q20 scans lineitem more than once:\n$q20")
    val q21 = executedPlan(DecisionSupport.q21WaitingSupplier(spark, sf))
    assert(liScans(q21) <= 1, s"q21 scans lineitem more than once:\n$q21")
  }

  test("corr_profile reads lineitem once; hll_rollup reads events once") {
    val corr = executedPlan(graft.operators.Reports.corrProfile(spark, sf))
    assert("lineitem".r.findAllIn(corr).length <= 1,
      s"corr moments should come from one scan:\n$corr")
    // the rollup's three levels must read the cached register table,
    // not re-scan the raw log per level
    val roll = executedPlan(graft.operators.Sketches.hllRollup(spark, sf))
    assert("events".r.findAllIn(roll).length <= 1,
      s"hll_rollup must build registers from one raw pass:\n$roll")
    assert(roll.contains("InMemoryTableScan") || roll.contains("TableCacheQueryStage"),
      "register levels should read the cached register table")
  }

  test("round-8 additions keep their scale shapes in the executed plan") {
    // cms_topk: the 1024-row cell table rides a broadcast; the fan-out
    // count is partial-aggregated (no raw-row shuffle); no cartesian
    val cms = executedPlan(graft.operators.Sketches.cmsTopk(spark, sf))
    assert(cms.contains("BroadcastHashJoin"), s"cell probe must broadcast:\n$cms")
    assert(!cms.contains("CartesianProduct"))
    // bitmap_distinct: ONE raw events pass builds the cached word
    // table; the ALL row merges words from cache
    val bm = executedPlan(graft.operators.Sketches.bitmapDistinct(spark, sf))
    assert("events".r.findAllIn(bm).length <= 1,
      s"bitmap levels must not re-scan the raw log:\n$bm")
    assert(bm.contains("InMemoryTableScan") || bm.contains("TableCacheQueryStage"))
    // session_overlap: the interval join must be the cell EQUI-join,
    // never an inequality cross product
    val ov = executedPlan(graft.operators.Analytics.sessionOverlap(spark, sf))
    assert(!ov.contains("CartesianProduct") && !ov.contains("BroadcastNestedLoop"),
      s"overlap join must stay an equi-join on the time cell:\n$ov")
    // fuzzy_name_pairs: candidates come from the variant-hash
    // equi-join, not a name × name cross product
    val fz = executedPlan(graft.operators.Dedup.fuzzyNamePairs(spark, sf))
    assert(!fz.contains("CartesianProduct") && !fz.contains("BroadcastNestedLoop"),
      s"fuzzy candidates must come from the deletion-variant equi-join:\n$fz")
  }

  test("map-only text operators carry no exchange before their output sort") {
    // doc_chunk and winnowing_fp are pure per-doc fan-outs/projections:
    // the ONLY exchange in the plan may be the final presentation sort
    for ((name, df) <- Seq(
        "doc_chunk" -> graft.operators.TextAnalysis.docChunk(spark, sf),
        "winnowing_fp" -> graft.operators.TextAnalysis.winnowingFp(spark, sf))) {
      val plan = executedPlan(df)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val range = "rangepartitioning".r.findAllIn(plan).length
      assert(exchanges <= range + 1,
        s"$name should be map-side up to the output sort:\n$plan")
    }
  }

  test("round-11 additions keep their scale shapes in the executed plan") {
    // permutation_test_value: ALL 21 splits' moments from ONE raw
    // events pass — a per-split scan would be 21× the IO
    val perm = executedPlan(graft.operators.Stats.permutationTestValue(spark, sf))
    assert("events".r.findAllIn(perm).length <= 1,
      s"permutation moments must come from one scan:\n$perm")
    assert(!perm.contains("Join"), s"permutation test needs no join:\n$perm")
    // target_encode_brand: the part dim rides a broadcast; the global
    // prior is a broadcast back, never a re-aggregation of the fact
    val te = executedPlan(graft.operators.Features.targetEncodeBrand(spark, sf))
    assert(te.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$te")
    assert(!te.contains("CartesianProduct"))
    // mips_topk: query side broadcast (BNLJ by construction — the
    // corpus side must stream map-only); never a sort-merge
    val mips = executedPlan(graft.operators.Ann.mipsTopk(spark, sf))
    assert(!mips.contains("SortMergeJoin"),
      s"mips corpus scan must stream against the broadcast query set:\n$mips")
    // local_clustering / graph_modularity: bounded equi-joins only
    for ((name, df) <- Seq(
        "local_clustering" -> graft.operators.Graph.localClustering(spark, sf),
        "graph_modularity" -> graft.operators.Graph.graphModularity(spark, sf))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"),
        s"$name must stay equi-join-bounded:\n$plan")
    }
    // xyz_classification: moments reduce in ONE lineitem pass; the
    // month-count scalar rides a broadcast
    val xyz = executedPlan(graft.operators.Reports.xyzClassification(spark, sf))
    assert("lineitem".r.findAllIn(xyz).length <= 2,
      s"xyz should scan lineitem for moments + month count only:\n$xyz")
    assert(!xyz.contains("SortMergeJoin"), s"scalar joins must broadcast:\n$xyz")
  }

  test("round-12 additions keep their scale shapes in the executed plan") {
    // abc_xyz_matrix: BOTH classifications from ONE lineitem scan
    // (the cached (part, month) frame) — a regression to two scans
    // would double the fact IO silently
    val axm = executedPlan(graft.operators.Reports.abcXyzMatrix(spark, sf))
    assert("lineitem".r.findAllIn(axm).length <= 1,
      s"abc_xyz must derive both classifications from one scan:\n$axm")
    graft.core.OwnedCaches.release()
    // croston_demand: one partial-agg chain, no join at all
    val cro = executedPlan(graft.operators.Reports.crostonDemand(spark, sf))
    assert(!cro.contains("Join"), s"croston needs no join:\n$cro")
    assert("lineitem".r.findAllIn(cro).length <= 1)
    // degree_assortativity / community_louvain: equi-join bounded
    for ((name, df) <- Seq(
        "degree_assortativity" -> graft.operators.Graph.degreeAssortativity(spark, sf),
        "cramers_v" -> graft.operators.Stats.cramersV(spark, sf),
        "time_decay_attribution" -> graft.operators.Commerce.timeDecayAttribution(spark, sf))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"),
        s"$name must stay equi-join-bounded:\n$plan")
    }
    // negative_sampling_pairs: the customers × brands candidate frame
    // must come from a BROADCAST of the brand dictionary (a shuffled
    // cartesian would scale with the fact side)
    val neg = executedPlan(graft.operators.Features.negativeSamplingPairs(spark, sf))
    assert(!neg.contains("CartesianProduct"),
      s"brand dictionary must broadcast under the candidate build:\n$neg")
    // training_shard_manifest / token_window_histogram: map-only until
    // the bucket/shard aggregate — exactly one documents scan
    for ((name, df) <- Seq(
        "training_shard_manifest" -> graft.operators.TextAnalysis.trainingShardManifest(spark, sf),
        "token_window_histogram" -> graft.operators.TextAnalysis.tokenWindowHistogram(spark, sf))) {
      val plan = executedPlan(df)
      assert("documents".r.findAllIn(plan).length <= 1,
        s"$name must reduce in one documents pass:\n$plan")
    }
  }

  test("round-13: no unpartitioned window over a customer-grain frame") {
    // segment_migration / pareto_threshold / lorenz_curve / decile_lift
    // route their customer-grain ranks through the two-level prefix
    // sum (Commerce.globalRowNumber/globalRankCumsum). A regression
    // would reappear as (a) an ntile over the raw customer frame or
    // (b) a Window whose spec touches o_custkey without the __bucket
    // partition column — both pinned here. (The remaining
    // unpartitioned windows in these plans run over per-bucket or
    // per-decile aggregates — bounded by value range, not row count.)
    // thunks, not DataFrames: eager construction would register all
    // four queries' owned caches up front, and the first release()
    // would unpersist the later queries' frames before they run
    for ((name, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "segment_migration" -> (() => graft.operators.Reports.segmentMigration(spark, sf)),
        "pareto_threshold" -> (() => graft.operators.Reports.paretoThreshold(spark, sf)),
        "lorenz_curve" -> (() => graft.operators.Reports.lorenzCurve(spark, sf)),
        "decile_lift" -> (() => graft.operators.Features.decileLift(spark, sf)))) {
      val plan = executedPlan(mk())
      assert(!plan.contains("ntile("),
        s"$name must rank via the prefix-sum tile arithmetic:\n$plan")
      val bad = plan.linesIterator.filter(l =>
        l.contains("Window ") && l.contains("o_custkey") &&
          !l.contains("__bucket")).toSeq
      assert(bad.isEmpty,
        s"$name has an unpartitioned customer-grain window:\n${bad.mkString("\n")}")
      // ≤2: the customer-grain frame itself scans orders once; the
      // date-horizon / period-midpoint scalar takes its own tiny
      // min/max agg pass (segment_migration, decile_lift)
      assert("orders".r.findAllIn(plan).length <= 2,
        s"$name must not rebuild the customer frame per rank:\n$plan")
      graft.core.OwnedCaches.release()
    }
  }

  test("round-13: recs_holdout_eval derives both frames from one fact scan") {
    // ub (user profiles) and ob (training baskets) must both read the
    // cached (order, user, brand, is_train) frame — a regression to
    // independent lineitem⋈part⋈orders builds doubles the fact IO
    val plan = executedPlan(graft.operators.Commerce.recsHoldoutEval(spark, sf))
    assert("lineitem".r.findAllIn(plan).length <= 1,
      s"recs_holdout_eval must scan lineitem once:\n$plan")
    assert("orders".r.findAllIn(plan).length <= 1,
      s"recs_holdout_eval must scan orders once:\n$plan")
    graft.core.OwnedCaches.release()
  }

  test("round-12b additions keep their scale shapes in the executed plan") {
    // anova_oneway: ONE conditional-moment pass over the raw log —
    // no join, no second scan (the whole point of the pivoted form)
    val an = executedPlan(graft.operators.Stats.anovaOneway(spark, sf))
    assert(!an.contains("Join"), s"anova needs no join:\n$an")
    // count the scan by file path — the n_events OUTPUT column would
    // otherwise trip a bare "events" substring count
    assert("events.parquet".r.findAllIn(an).length <= 1)
    // bootstrap_poisson_ci: the B weight columns ride ONE orders scan
    val bo = executedPlan(graft.operators.Stats.bootstrapPoissonCi(spark, sf))
    assert("orders".r.findAllIn(bo).length <= 1,
      s"all 40 resamples must come from one scan:\n$bo")
    // pareto_threshold: one orders scan feeds the ranked cumsum
    val pa = executedPlan(graft.operators.Reports.paretoThreshold(spark, sf))
    assert("orders".r.findAllIn(pa).length <= 1,
      s"pareto thresholds read orders once:\n$pa")
    // return_rate_by_brand: one lineitem scan, brand join only
    val rr = executedPlan(graft.operators.Reports.returnRateByBrand(spark, sf))
    assert("lineitem".r.findAllIn(rr).length <= 1,
      s"return rates reduce in one lineitem pass:\n$rr")
    // vocab_coverage_topk: conditional sums off ONE ranked tf frame —
    // a per-k pass would re-scan documents
    val vc = executedPlan(graft.operators.TextAnalysis.vocabCoverageTopk(spark, sf))
    assert("documents".r.findAllIn(vc).length <= 1,
      s"coverage curve must come from one tf build:\n$vc")
    // cross_price_elasticity / user_event_diversity /
    // link_prediction_resource_alloc: equi-join bounded
    for ((name, df) <- Seq(
        "cross_price_elasticity" -> graft.operators.Commerce.crossPriceElasticity(spark, sf),
        "user_event_diversity" -> graft.operators.Analytics.userEventDiversity(spark, sf),
        "link_prediction_resource_alloc" -> graft.operators.Graph.linkPredictionResourceAlloc(spark, sf))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"),
        s"$name must stay equi-join-bounded:\n$plan")
    }
    graft.core.OwnedCaches.release()
  }

  test("round-15 embedding near-dup family keeps its scale shapes in the executed plan") {
    // cellNearDupPairs: the candidate join is a cell EQUI-join with the
    // resident side broadcast below the cap — never a cartesian pair
    // scan (the O(n²) shape this family exists to retire), never a
    // sort-merge on the tiny cell key
    val lsh = executedPlan(graft.operators.Ann.dedupEmbeddingLsh(spark, sf))
    assert(!lsh.contains("CartesianProduct"),
      s"cell-bounded scan must never form a cartesian pair space:\n$lsh")
    assert(lsh.contains("BroadcastHashJoin"),
      s"resident side must broadcast below the cap:\n$lsh")
    // the exact branch below the corpus cap IS the documented
    // broadcast pair loop (oracle ground truth) — pin the branch
    // SELECTION: exact at test scale, cell-bounded when forced
    val exact = executedPlan(
      graft.operators.Ann.dedupEmbeddingCosine(spark, sf, forceScale = false))
    assert(exact.contains("BroadcastNestedLoopJoin"),
      s"below the cap the exact pair loop must run:\n$exact")
    // the routed branch keeps broadcast nested loops only for the
    // k-row centroid crossJoin (the approved scalar-broadcast
    // pattern); the PAIR space must come from the cell equi-join —
    // pin that no BNLJ carries the exact branch's vec_a < vec_b
    // inequality pair condition
    val routed = executedPlan(
      graft.operators.Ann.dedupEmbeddingCosine(spark, sf, forceScale = true))
    assert(!routed.contains("CartesianProduct"))
    val pairLoop = "BroadcastNestedLoopJoin[^\\n]*vec_a[^\\n]*<[^\\n]*vec_b".r
    assert(pairLoop.findFirstIn(routed).isEmpty,
      s"the routed branch must not contain the n² pair loop:\n$routed")
    // incremental: spanning joins only — no cartesian, equi-joins on
    // cell, corpus×corpus never forms (split-before-join)
    val inc = executedPlan(graft.operators.Ann.dedupEmbeddingIncremental(spark, sf))
    assert(!inc.contains("CartesianProduct"),
      s"incremental screen must stay cell-equi-join-bounded:\n$inc")
  }

  test("dynamic partition pruning engages on a partitioned fact join") {
    // at 100 TB the fact lives partitioned (month/date); a dim-filtered
    // join must prune partitions at RUNTIME via DPP — a regression to
    // a full scan is invisible at test SF except in the plan, so pin
    // the DynamicPruningExpression in the partition filters
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    graft.core.Tables(spark, sf).orders
      .withColumn("m", expr("year(o_orderdate) * 12 + month(o_orderdate) - 1"))
      .write.mode("overwrite").partitionBy("m").parquet(dir)
    val fact = spark.read.parquet(dir)
    val months = fact.select(col("m")).distinct().limit(3)
      .collect().map(_.getAs[Int]("m"))
    // DPP's planner wants a SELECTIVE predicate on the build side —
    // write the dim to parquet and filter it, the shape a real
    // dim-filtered fact join has
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    fact.select(col("m")).distinct()
      .withColumn("keep", when(col("m").isin(months.map(Integer.valueOf): _*), 1).otherwise(0))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("keep") === 1)
    val joined = fact.join(dim, Seq("m"))
      .agg(count(lit(1)).as("n"), countDistinct(col("m")).as("nm"))
    val rows = joined.collect()
    assert(rows.head.getAs[Long]("nm") == months.length.toLong)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"the fact scan must carry a DynamicPruningExpression partition filter:\n" +
        plan.take(4000))
  }

  test("AQE skew-join handling engages on a manufactured hot key") {
    // salted_join is the MANUAL skew treatment; at 100 TB the first
    // line of defense is AQE's runtime skew split — pin that the
    // session config actually produces a skew=true sort-merge join
    // when one key carries ~all the probe rows
    import org.apache.spark.sql.functions._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.forceOptimizeSkewedJoin" ->
        spark.conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin", "false"))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try {
      val hot = spark.range(0, 200000)
        .selectExpr("CASE WHEN id % 100 < 99 THEN 0 ELSE id END AS k",
          "repeat(CAST(id AS STRING), 8) AS payload")
      val dim = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS attr")
      val joined = hot.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(expr("attr + length(payload)")).as("s"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key join skew=true:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
