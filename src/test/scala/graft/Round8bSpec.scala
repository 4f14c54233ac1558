package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Reports, TextAnalysis}

/** Round-8 continuation suites: winnowing fingerprints, token
  * chunking, bigram novelty, RANGE-frame windows, degree-oriented
  * triangle counting.
  */
class Round8bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("winnowing guarantees a shared fingerprint for matches of length >= K+W-1") {
    graft.functions.WinnowedHashes.register(spark)
    import spark.implicits._
    // K=8, W=4 → any shared run of >= 11 bytes must yield >= 1 shared
    // selected hash; these two strings share ONLY the 16-byte middle
    val shared = "zqxjkvbwpfmgyhdt"
    val docs = Seq(
      (1L, s"aaaa bbbb $shared cccc dddd"),
      (2L, s"1111 2222 $shared 3333 4444")).toDF("id", "text")
    val fps = docs
      .select(col("id"),
        explode(call_function("graft_winnowed_hashes", col("text"))).as("e"))
      // strip the position word — a match moves position, not hash
      .select(col("id"), col("e").bitwiseAND(lit(2147483647L)).as("h"))
    val sharedHashes = fps.filter(col("id") === 1L).select("h")
      .intersect(fps.filter(col("id") === 2L).select("h"))
    assert(sharedHashes.count() >= 1,
      "winnowing failed the shared-fingerprint guarantee on a 16-byte verbatim match")
    // any doc of >= K bytes yields at least one fingerprint
    val one = Seq((3L, "12345678")).toDF("id", "text")
      .select(size(call_function("graft_winnowed_hashes", col("text"))).as("n"))
      .head().getInt(0)
    assert(one == 1, s"K-byte doc should yield exactly one fingerprint, got $one")
    // winnowing selects a SUBSET of the position hashes (no invented values)
    graft.functions.RollingHashes.register(spark)
    val doc = Seq((4L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val win = doc.select(explode(call_function("graft_winnowed_hashes", col("text"))).as("e"))
      .select(col("e").bitwiseAND(lit(2147483647L)).as("h"))
    // rolling_hashes mod-samples, so re-derive the full hash set via winnowing
    // with every position: W windows of the same text always pick from h[]
    assert(win.count() >= (44 - 8 + 1) / 4 / 2,
      "winnowing density fell below the 2/(w+1) expectation floor")
  }

  test("doc_chunk covers every token exactly and strides correctly") {
    val chunks = TextAnalysis.docChunk(spark, TestSpark.sf).cache()
    val toks = graft.core.Tables(spark, TestSpark.sf).documents
      .select(col("doc_id"),
        size(graft.functions.GraftFunctions.normTokens(col("text"))).as("n_tok"))
    val agg = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start_tok") + col("n_chunk_toks")).as("max_end"),
      min(col("start_tok")).as("min_start"),
      max(col("n_chunk_toks")).as("max_len"))
    val joined = agg.join(toks, "doc_id")
    // first chunk starts at 0; no chunk exceeds ChunkSize; the last
    // chunk's window reaches the end of the document
    assert(joined.filter(col("min_start") =!= 0).count() == 0)
    assert(joined.filter(col("max_len") > 64).count() == 0)
    assert(joined.filter(col("n_tok") > 0 && col("max_end") < col("n_tok")).count() == 0,
      "a document's tail is not covered by any chunk")
    // strides: chunk i starts at i*48 — so n_chunks is determined by n_tok
    assert(joined.filter(col("n_tok") > 64 &&
      col("n_chunks") =!= (lit(1) + ceil((col("n_tok") - 64) / 48.0).cast("long"))).count() == 0)
    chunks.unpersist()
  }

  test("lm_novelty emits only test-split docs with ratios in [0,1]") {
    val nov = TextAnalysis.lmNovelty(spark, TestSpark.sf).cache()
    val split = TextAnalysis.trainTestSplit(spark, TestSpark.sf)
      .select(col("doc_id"), col("split"))
    val bad = nov.join(split, "doc_id").filter(col("split") =!= "test")
    assert(bad.count() == 0, "a train-split doc leaked into the novelty output")
    assert(nov.filter(col("n_novel") > col("n_bigrams") || col("n_novel") < 0).count() == 0)
    assert(nov.filter(col("novelty_ratio") < 0.0 || col("novelty_ratio") > 1.0).count() == 0)
    assert(nov.count() > 0)
    nov.unpersist()
  }

  test("window_range_frame matches a brute-force 30-day self-join") {
    val win = Reports.windowRangeFrame(spark, TestSpark.sf)
    val o = graft.core.Tables(spark, TestSpark.sf).orders
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("day"),
        col("o_totalprice").cast("decimal(18,4)").as("p"))
    val brute = o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
        col("b.day").between(col("a.day") - 29, col("a.day")))
      .groupBy(col("a.o_orderkey").as("o_orderkey"))
      .agg(sum(col("b.p")).cast("double").as("bsum"), count(lit(1)).cast("int").as("bcnt"))
    val diff = win.join(brute, "o_orderkey")
      .filter(col("trailing_30d_sum") =!= col("bsum") ||
        col("trailing_30d_cnt") =!= col("bcnt"))
    assert(diff.count() == 0, "RANGE frame disagrees with the brute-force trailing window")
  }

  test("hll_rollup register merge is lossless vs the direct per-type sketch") {
    import graft.operators.Sketches
    // the 'ALL'-months row per event_type is built by MERGING monthly
    // registers; the direct sketch hashes the same distinct users, so
    // a lossless merge must land on the identical estimate
    val merged = Sketches.hllRollup(spark, TestSpark.sf)
      .filter(col("month") === "ALL" && col("event_type") =!= "ALL")
      .select(col("event_type"), col("hll_estimate").as("merged"))
    val direct = Sketches.approxDistinctHll(spark, TestSpark.sf)
      .select(col("event_type"), col("hll_estimate").as("direct"))
    val diff = merged.join(direct, "event_type")
      .filter(col("merged") =!= col("direct"))
    assert(diff.count() == 0, "register merge changed the estimate — merge is not lossless")
  }

  test("RangeBandJoinExec: broadcast exchange planted, codegen engaged, matches the BNLJ form") {
    import graft.etl.StarSchema
    val custom = StarSchema.rangeBandJoinCustom(spark, TestSpark.sf)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("RangeBandJoin"), "custom exec not in the plan")
    assert(plan.contains("BroadcastExchange"),
      "EnsureRequirements should broadcast the band table")
    val composed = StarSchema.rangeBandJoin(spark, TestSpark.sf)
    assert(custom.collect().toSeq == composed.collect().toSeq,
      "binary-search path diverged from the nested-loop predicate form")
    val finalPlan = custom.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) RangeBandJoin""".r.findFirstIn(finalPlan).isDefined,
      "RangeBandJoin must run inside WholeStageCodegen")
  }

  test("RangeBandJoinExec: generated code survives fallback=false; gaps yield null; overlap is loud") {
    import spark.implicits._
    val bands = Seq((0L, 10L, 0L), (20L, 30L, 1L)).toDF("lo", "hi", "band_id")
    val probe = Seq((5L, 100L), (15L, 101L), (25L, 102L), (30L, 103L))
      .toDF("v", "payload")
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val out = graft.plans.RangeBand.join(spark, probe, bands)
        .collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toMap
      assert(out == Map(100L -> 0L, 101L -> null, 102L -> 1L, 103L -> null),
        s"band assignment wrong: $out")
    }
    val overlapping = Seq((0L, 15L, 0L), (10L, 30L, 1L)).toDF("lo", "hi", "band_id")
    val ex = intercept[Exception] {
      graft.plans.RangeBand.join(spark, probe, overlapping).collect()
    }
    assert(ex.getMessage != null)
  }

  private def withSQLConf(kv: (String, String))(f: => Unit): Unit = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }

  test("corpus curation demo: the funnel narrows and every stage is non-empty") {
    val chain = PipelineDemo.corpus(spark, TestSpark.sf).toMap
    assert(chain("raw_docs") > 0)
    assert(chain("quality_kept") <= chain("raw_docs"))
    assert(chain("canonical_curated") <= chain("quality_kept"))
    assert(chain("batch_admitted") > 0, "no batch doc admitted — split or LSH broke")
    // the REJECT branch must also be live on this data: a screening
    // query that admits everything proves nothing
    val rejected = graft.operators.Dedup.dedupIncremental(spark, TestSpark.sf)
      .filter(!col("admitted")).count()
    assert(rejected > 0, "no batch doc rejected — the near-dup screen is value-dead")
    assert(chain("chunks") >= chain("canonical_curated"),
      "each curated doc yields at least one chunk")
    assert(chain("packed_docs") == chain("canonical_curated"),
      "every curated doc must land in a training sequence")
    assert(chain("training_sequences") > 0 &&
      chain("training_sequences") <= chain("packed_docs"))
  }

  test("probe-side filters push through RangeBandJoin down to the parquet scan") {
    import spark.implicits._
    val bands = Seq((0L, 5000000L, 0L), (5000000L, 15000000L, 1L),
      (15000000L, 10000000000L, 2L)).toDF("lo", "hi", "band_id")
    val probe = graft.core.Tables(spark, TestSpark.sf).orders.select(
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
      col("o_orderkey"), col("o_totalprice"))
    val filtered = graft.plans.RangeBand.join(spark, probe, bands)
      .filter(col("o_orderkey") < 100 && col("matched_band") === 0)
    // the probe-only conjunct must reach the scan; the matched_band
    // conjunct (a generated column) must stay above the join
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(optimized.indexOf("RangeBandJoin") < optimized.indexOf("o_orderkey"),
      s"probe filter did not move below the custom node:\n$optimized")
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*LessThan\\(o_orderkey,100\\)".r.findFirstIn(physical).isDefined,
      s"pushed predicate never reached the parquet scan:\n$physical")
    // and the rewrite is semantics-preserving
    val expected = graft.plans.RangeBand.join(spark, probe, bands)
      .collect().filter(r => r.getLong(1) < 100 && !r.isNullAt(3) && r.getLong(3) == 0L)
    assert(filtered.count() == expected.length)
  }

  test("sessionize stream resumes from checkpoint: state survives restart, no replay") {
    import graft.streaming.EventStream
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_ck_in").toString
    val cp = Files.createTempDirectory("graft_ck_cp").toString
    val out = Files.createTempDirectory("graft_ck_out").toString
    val Min = 60L * 1000000
    def ev(id: Long, ts: Long, user: Long): String =
      s"""{"event_id":$id,"ts_us":$ts,"user_id":$user,"event_type":"view","value":1.0}"""
    // batch 1: two events 1 min apart — ONE open session, no output yet
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(ev(1, 0, 7), ev(2, 1 * Min, 7)).mkString("\n"))
    def run(): Unit = {
      val q = EventStream.sessionizeStream(spark, in)
        .writeStream.option("checkpointLocation", cp)
        .format("parquet").outputMode("append").start(out)
      try q.processAllAvailable() finally q.stop()
    }
    run() // process b1, then STOP — open-session state is checkpointed
    // batch 2 after restart: a 60-min-later event closes the session.
    // If state died with the first query, the closed session loses its
    // 2 buffered events; if b1 replayed, it gains duplicates.
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(ev(3, 61 * Min, 7)).mkString("\n"))
    run() // NEW query instance, SAME checkpoint
    val sessions = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_start_us"), r.getAs[Int]("n_events")))
    assert(sessions.toSeq == Seq((7L, 0L, 2)),
      s"restart broke sessionization state: ${sessions.toSeq}")
  }

  test("streaming HLL sink: merged registers equal the batch sketch over all data") {
    import graft.streaming.{EventStream, HllSink}
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_hin").toString
    val st = Files.createTempDirectory("graft_hst").toString
    def ev(id: Long, user: Long, typ: String): String =
      s"""{"event_id":$id,"ts_us":${id * 1000},"user_id":$user,"event_type":"$typ","value":1.0}"""
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      (1 to 40).map(i => ev(i, i % 17, if (i % 2 == 0) "view" else "click")).mkString("\n"))
    val q = HllSink.start(spark, in, st)
    try {
      q.processAllAvailable()
      // second batch re-sees some users (idempotent merge) + new ones
      Files.writeString(Paths.get(s"$in/b2.jsonl"),
        (30 to 80).map(i => ev(i, i % 29, if (i % 3 == 0) "view" else "click")).mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()
    // batch reference: sketch ALL input in one shot through the same
    // register derivation, staged as a one-version state dir
    val ref = Files.createTempDirectory("graft_href").toString
    HllSink.registers(spark.read.schema(EventStream.eventSchema).json(in))
      .write.parquet(s"$ref/v0")
    val streamed = HllSink.currentEstimate(spark, st)
      .withColumnRenamed("hll_estimate", "streamed")
    val direct = HllSink.currentEstimate(spark, ref)
      .withColumnRenamed("hll_estimate", "direct")
    val diff = streamed.join(direct, "event_type")
      .filter(col("streamed") =!= col("direct"))
    assert(diff.count() == 0, "cross-batch register merge diverged from the batch sketch")
    // state is bounded by types × 64 registers, not by distinct users
    assert(HllSink.currentRegisters(spark, st).count() <= 2 * 64)
  }

  test("corr_profile agrees with Spark's built-in corr to 1e-10") {
    val mine = graft.operators.Reports.corrProfile(spark, TestSpark.sf)
    val ref = graft.core.Tables(spark, TestSpark.sf).lineitem
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("ref_qp"),
        corr(col("l_discount"), col("l_extendedprice")).as("ref_dp"))
    val bad = mine.join(ref, "l_returnflag")
      .filter(abs(col("corr_qty_price") - col("ref_qp")) > 1e-10 ||
        abs(col("corr_disc_price") - col("ref_dp")) > 1e-10 ||
        abs(col("corr_qty_price")) > 1.0 || abs(col("corr_disc_price")) > 1.0)
    assert(bad.count() == 0, "exact-moment correlation drifted from the reference estimator")
  }

  test("asof forward/backward bracket every event; skew report is internally consistent") {
    import graft.operators.{Reports, Skew}
    val fwd = Reports.asofEventOrderForward(spark, TestSpark.sf)
      .select(col("event_id"), col("next_order_ts_us"))
    val bwd = Reports.asofEventOrder(spark, TestSpark.sf)
      .select(col("event_id"), col("last_order_ts_us"))
    val ev = graft.core.Tables(spark, TestSpark.sf).events
      .select(col("event_id"), col("ts_us"))
    val bracketed = ev.join(fwd, "event_id").join(bwd, "event_id")
    assert(bracketed.filter(col("next_order_ts_us") < col("ts_us")).count() == 0,
      "a 'next' order precedes its event")
    assert(bracketed.filter(col("last_order_ts_us") > col("ts_us")).count() == 0,
      "a 'last' order follows its event")
    // an event with both neighbors has last <= next by transitivity
    assert(bracketed.filter(col("last_order_ts_us") > col("next_order_ts_us")).count() == 0)
    val r = Skew.skewDiagnose(spark, TestSpark.sf).head()
    assert(r.getAs[Double]("imbalance_factor") >= 1.0)
    val share = r.getAs[Double]("topk_share")
    assert(share > 0.0 && share <= 1.0)
    assert(r.getAs[Long]("max_rows") <= r.getAs[Long]("total_rows"))
  }

  test("triangle_count: degree-oriented enumeration equals the naive id-ordered count") {
    val r = Graph.triangleCount(spark, TestSpark.sf).head()
    val naive = {
      val t = graft.core.Tables(spark, TestSpark.sf)
      val baskets = t.lineitem.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("basket"))
      val edges = baskets
        .select(explode(col("basket")).as("p1"), col("basket"))
        .select(col("p1"), explode(col("basket")).as("p2"))
        .filter(col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("p1", "p2")
      edges.as("e1")
        .join(edges.as("e2"), col("e1.p2") === col("e2.p1"))
        .join(edges.as("e3"),
          col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"), "left_semi")
        .count()
    }
    assert(r.getAs[Long]("n_triangles") == naive,
      s"oriented count ${r.getAs[Long]("n_triangles")} != naive $naive")
    assert(r.getAs[Long]("n_edges") > 0 && r.getAs[Long]("n_nodes") > 0)
    // the wedge enumeration must be equi-join based — no cartesian
    val plan = Graph.triangleCount(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "triangle wedge join degenerated to a cartesian")
    // round 14: under the measured admission cap the executed plan is
    // the single-task replay (no join at all); the at-scale branch
    // keeps the equi-join + LEFT SEMI closing probe
    assert(plan.contains("MapPartitions"),
      "bench-scale graph should take the single-task replay")
    val dplan = Graph.triangleCount(spark, TestSpark.sf, forceDistributed = true)
      .queryExecution.executedPlan.toString
    graft.core.OwnedCaches.release()
    assert(!dplan.contains("CartesianProduct"), "triangle wedge join degenerated to a cartesian")
    assert(dplan.contains("LeftSemi"), "closing-edge check should be a LEFT SEMI join")
  }
}
