package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Round-8 suites: stream-stream LEFT OUTER interval join semantics. */
class StreamOuterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("left-outer interval join emits unmatched clicks exactly once, after the watermark passes") {
    val cdir = java.nio.file.Files.createTempDirectory("graft_loc").toString
    val pdir = java.nio.file.Files.createTempDirectory("graft_lop").toString
    val Min = 60L * 1000000
    def ev(id: Long, ts: Long, user: Long, typ: String): String =
      s"""{"event_id":$id,"ts_us":$ts,"user_id":$user,"event_type":"$typ","value":1.0}"""
    // batch 1: two clicks at t=1min; user 10's purchase at t=6min matches,
    // user 11 never purchases. Watermark after this batch is far below the
    // click times — nothing may be declared unmatched yet.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$cdir/b1.jsonl"),
      Seq(ev(1, 1 * Min, 10, "click"), ev(2, 1 * Min, 11, "click")).mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$pdir/b1.jsonl"),
      ev(100, 6 * Min, 10, "purchase"))
    val q = EventStream.intervalJoinLeftOuterStream(spark, cdir, pdir)
      .writeStream.outputMode("append").format("memory").queryName("loij").start()
    try {
      q.processAllAvailable()
      def rows: Seq[(Long, Long, Any)] = spark.table("loij").collect().toSeq
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
          if (r.isNullAt(r.fieldIndex("purchase_id"))) null
          else r.getAs[Long]("purchase_id")))
      // the inner match may emit eagerly; the unmatched click must NOT
      // have emitted yet (its match window is still open)
      assert(!rows.exists(_._2 == 2L),
        s"unmatched click emitted before the watermark passed: $rows")
      // batch 2: late traffic on BOTH sources pushes each source's
      // watermark to 60-10=50 min — past click-time + interval (11 min)
      // for the batch-1 clicks. The watermark recomputes after this batch.
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$cdir/b2.jsonl"),
        ev(3, 60 * Min, 13, "click"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$pdir/b2.jsonl"),
        ev(101, 60 * Min, 14, "purchase"))
      q.processAllAvailable()
      // batch 3: one more trigger applies the advanced watermark and
      // evicts batch-1 state, emitting the null-padded outer row
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$cdir/b3.jsonl"),
        ev(4, 61 * Min, 15, "click"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$pdir/b3.jsonl"),
        ev(102, 61 * Min, 16, "purchase"))
      q.processAllAvailable()
      val out = rows
      // the matched click attributed exactly once
      assert(out.count(r => r._2 == 1L && r._3 == 100L) == 1, s"inner match wrong: $out")
      // the unmatched click emitted EXACTLY once, null-padded
      assert(out.count(r => r._2 == 2L) == 1, s"outer row not exactly-once: $out")
      assert(out.find(_._2 == 2L).get._3 == null, s"outer row not null-padded: $out")
      // fresh clicks whose match window is still open must not emit
      assert(!out.exists(r => r._2 == 3L || r._2 == 4L),
        s"open-window click leaked an outer row: $out")
    } finally q.stop()
  }
}

/** Streaming near-dup suppression: batch simhash machinery inside a
  * foreachBatch sink with a persistent signature store.
  */
class StreamNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("near-dup sink suppresses within-batch and cross-batch duplicates exactly once") {
    import graft.streaming.NearDupSink
    val in = java.nio.file.Files.createTempDirectory("graft_nd_in").toString
    val st = java.nio.file.Files.createTempDirectory("graft_nd_st").toString
    val out = java.nio.file.Files.createTempDirectory("graft_nd_out").toString + "/dec"
    val tA = "the quick brown fox jumps over the lazy dog near the river bank"
    val tB = "completely different subject matter discussing spark catalyst optimizer internals"
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"ts_us":${id * 1000},"text":"$text"}"""
    // batch 1: doc 1 unique, doc 2 = same text (within-batch dup of 1)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.jsonl"),
      Seq(doc(1, tA), doc(2, tA)).mkString("\n"))
    val q = NearDupSink.start(spark, in, st, out)
    try {
      q.processAllAvailable()
      // batch 2: doc 3 repeats tA (dup via the STORE), doc 4 unique
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b2.jsonl"),
        Seq(doc(3, tA), doc(4, tB)).mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()
    val dec = NearDupSink.decisions(spark, out).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(dec.size == 4, s"one decision per doc: $dec")
    assert(dec(1) == (false, -1L), s"doc 1 must be kept: $dec")
    assert(dec(2) == (true, 1L), s"doc 2 is a within-batch dup of 1: $dec")
    assert(dec(3) == (true, 1L), s"doc 3 is a cross-batch dup of 1 via the store: $dec")
    assert(dec(4) == (false, -1L), s"doc 4 is unique: $dec")
    // the store holds exactly the survivors
    val store = NearDupSink.currentSignatures(spark, st).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(store == Seq(1L, 4L), s"store must hold survivors only: $store")
  }
}

/** Round-8 operator suites: span dedup, BM25, mix sampling. */
class Round8OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("dedup_substring_span finds the planted near-dup pairs and nothing vocabulary-level") {
    import graft.operators.Dedup
    val pairs = Dedup.dedupSubstringSpan(spark, sf).collect()
    // long verbatim spans are rare: the sf0.01 corpus pairs only its
    // planted near-dups (~25), never the vocabulary-sharing majority
    assert(pairs.length > 0 && pairs.length < 100,
      s"expected only near-dup-scale pair counts, got ${pairs.length}")
    // span pairs and minhash near-dups measure different things (a
    // near-dup edited every <13 tokens shares no span), but on planted
    // near-dups they must overlap heavily
    val mh = Dedup.dedupMinHashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sp = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((mh & sp).size >= (mh.size * 4) / 5,
      s"span pairs cover too few minhash near-dups: ${(mh & sp).size}/${mh.size}")
  }

  test("dedup_substring_span maxDf cap drops a ubiquitous span's hot key") {
    import graft.operators.Dedup
    val uncapped = Dedup.dedupSubstringSpan(spark, sf).count()
    // df cap of 1 means only spans unique to a pair... cap 2 keeps
    // spans shared by at most 2 docs — pair count can only shrink
    val capped = Dedup.dedupSubstringSpan(spark, sf, maxDf = 2).count()
    assert(capped <= uncapped)
    // a generous cap is the identity (no span in sf0.01 is that hot)
    assert(Dedup.dedupSubstringSpan(spark, sf, maxDf = 100000).count() == uncapped)
  }

  test("bm25 ranks are dense per doc and scores decrease with rank") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.TextAnalysis.bm25Topk(spark, sf)
    val bad = r.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("score")).as("mn"))
      .filter(col("n") =!= col("mx") || col("mn") <= 0.0)
    assert(bad.isEmpty, "rank must be dense 1..n per doc with positive scores")
    // per-doc scores non-increasing in rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rank"))
    val inc = r.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(inc.isEmpty, "scores must be non-increasing in rank")
  }

  test("TokenGrams keeps multiplicity where TokenShingles dedupes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.TokenGrams.register(spark)
    graft.functions.TokenShingles.register(spark)
    val df = Seq("a b a b a", "x").toDF("text")
      .select(
        call_function("graft_grams", col("text"), lit(2)).as("grams"),
        call_function("graft_shingles", col("text"), lit(2)).as("shingles"))
      .collect()
    // "a b a b a": 4 positional bigrams (a b, b a, a b, b a) but only
    // 2 distinct shingles
    assert(df(0).getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(df(0).getSeq[String](1).toSet == Set("a b", "b a"))
    // single-token doc: no pair exists (TokenGrams emits empty, no
    // whole-text fallback)
    assert(df(1).getSeq[String](0).isEmpty)
    assert(df(1).getSeq[String](1) == Seq("x"))
  }

  test("embedding_kmeans partitions the corpus into non-trivial deterministic clusters") {
    import org.apache.spark.sql.functions._
    val a = graft.operators.Ann.embeddingKmeans(spark, sf)
    val rows = a.collect()
    val n = graft.core.Tables(spark, sf).embeddings.count()
    assert(rows.length == n, "every vector must be assigned exactly once")
    val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes.size > 1 && sizes.size <= 8, s"cluster count out of range: ${sizes.size}")
    // no degenerate all-in-one clustering after 3 Lloyd iterations
    assert(sizes.values.max < n, s"degenerate single cluster: $sizes")
    // deterministic across runs (integer-grid arithmetic)
    val b = graft.operators.Ann.embeddingKmeans(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("corpus_mix_sample keeps the corpus stream shuffle-free") {
    val df = graft.operators.TextAnalysis.corpusMixSample(spark, sf)
    df.collect()
    // drop the "== Initial Plan ==" copy — only the final plan ran
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the docs side joins the broadcast counts map-side; the only hash
    // exchange in the whole plan is the source-cardinality groupBy
    assert(plan.contains("BroadcastHashJoin"),
      s"counts must broadcast against the corpus stream:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges <= 1,
      s"expected at most the counts-aggregation exchange, got $hashExchanges:\n$plan")
  }

  test("mv_refresh genuinely merges: both sides of the cutoff are non-empty") {
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val cut = lit(graft.operators.Incremental.MvCutoff).cast("timestamp")
    // the two-paths-one-hash oracle would pass vacuously if the cutoff
    // emptied either side — pin that the merge is exercised
    assert(t.orders.filter(col("o_orderdate") < cut).count() > 0, "view side empty")
    assert(t.orders.filter(col("o_orderdate") >= cut).count() > 0, "delta side empty")
    // and some customer must have orders on BOTH sides (the merge's
    // add-both branch, not just the coalesce passthroughs)
    val both = t.orders.filter(col("o_orderdate") < cut).select("o_custkey")
      .intersect(t.orders.filter(col("o_orderdate") >= cut).select("o_custkey"))
    assert(both.count() > 0, "no customer spans the cutoff — add branch dead")
  }

  test("corpus_mix_sample is deterministic and respects the per-source shape") {
    import org.apache.spark.sql.functions._
    val a = graft.operators.TextAnalysis.corpusMixSample(spark, sf).collect()
    val b = graft.operators.TextAnalysis.corpusMixSample(spark, sf).collect()
    assert(a.sameElements(b), "sampler must be bit-deterministic across runs")
    // expected-budget sampling: every source survives, none grows
    val per = graft.operators.TextAnalysis.corpusMixSample(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("kept"))
    val full = graft.core.Tables(spark, sf).documents
      .groupBy(col("source")).agg(count(lit(1)).as("total"))
    val joined = per.join(full, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val kept = r.getAs[Long]("kept"); val total = r.getAs[Long]("total")
      assert(kept >= 1 && kept <= total, s"source ${r.getAs[String]("source")}: $kept/$total")
    }
  }
}
