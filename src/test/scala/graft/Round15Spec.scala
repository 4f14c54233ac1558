package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 streaming pins (VERDICT r14 #2 + ADVICE r14):
  *
  *  - The sum-merge sinks survive the MANUFACTURED crash state the
  *    r14 marker left possible — a latest snapshot WITHOUT its
  *    `_applied_batch` marker — without double-counting: the
  *    marker-less version is treated as uncommitted, the merge base
  *    falls back to the newest marked predecessor, and the replayed
  *    batch re-applies exactly once.
  *  - `commit` publishes marker + snapshot atomically (stage + one
  *    move): no post-commit state ever has a marked predecessor
  *    shadowed by a marker-less latest, and no staging debris
  *    survives.
  *  - `start()` pins a stable checkpointLocation, so a RESTARTED
  *    stream keeps monotonic batch ids and the replay guard cannot
  *    silently skip new batches (the ADVICE r14 data-loss mode).
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def dropMarker(stateDir: String): Unit = {
    val latest = graft.streaming.VersionedState.latestVersion(stateDir).get._1
    val marker = new java.io.File(latest, "_applied_batch")
    assert(marker.exists(), "test setup: latest version should carry a marker")
    assert(marker.delete())
  }

  test("MixPlanSink: replay onto a marker-less latest snapshot does not double-count") {
    import graft.streaming.MixPlanSink
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("source"))
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    def m(st: String) = MixPlanSink.currentState(spark, st).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens")))).toMap
    // reference run: both batches, no crash
    val ref = java.nio.file.Files.createTempDirectory("mix_ref").toString
    MixPlanSink.applyBatch(b0, ref, 0L)
    MixPlanSink.applyBatch(b1, ref, 1L)
    val want = m(ref)
    // crash run: batch 1's snapshot lands but its marker is destroyed
    // (the pre-r15 crash window, manufactured) — recovery replays it
    val st = java.nio.file.Files.createTempDirectory("mix_crash").toString
    MixPlanSink.applyBatch(b0, st, 0L)
    MixPlanSink.applyBatch(b1, st, 1L)
    dropMarker(st)
    MixPlanSink.applyBatch(b1, st, 1L) // foreachBatch failure-recovery replay
    assert(m(st) == want, "replay onto marker-less state double-counted")
    // and the next id still merges on top of the recovered state
    MixPlanSink.applyBatch(b1.limit(5), st, 2L)
    assert(m(st).values.map(_._1).sum == want.values.map(_._1).sum + 5)
  }

  test("HistogramSink: replay onto a marker-less latest snapshot does not double-count") {
    import graft.streaming.HistogramSink
    val vals = graft.core.Tables(spark, sf).orders
      .selectExpr("o_orderpriority AS k",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
    val b0 = vals.filter(col("v") % 2 === 0)
    val b1 = vals.filter(col("v") % 2 =!= 0)
    def total(st: String) = HistogramSink.currentHistogram(spark, st)
      .agg(coalesce(sum(col("c")), lit(0L))).collect().head.getLong(0)
    val ref = java.nio.file.Files.createTempDirectory("hist_ref").toString
    HistogramSink.applyBatch(b0, ref, 0L)
    HistogramSink.applyBatch(b1, ref, 1L)
    val want = total(ref)
    val st = java.nio.file.Files.createTempDirectory("hist_crash").toString
    HistogramSink.applyBatch(b0, st, 0L)
    HistogramSink.applyBatch(b1, st, 1L)
    dropMarker(st)
    HistogramSink.applyBatch(b1, st, 1L)
    assert(total(st) == want, "replay onto marker-less state doubled bucket mass")
  }

  test("VersionedState.commit publishes marker atomically and sweeps staging") {
    val VersionedState = graft.streaming.VersionedState
    val st = java.nio.file.Files.createTempDirectory("vs_atomic").toString
    val df = spark.range(3).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    val v0 = VersionedState.commit(df, st, 7L)
    // the published version carries its marker (same atomic move)
    assert(new java.io.File(s"$st/v$v0", "_applied_batch").exists())
    assert(VersionedState.lastAppliedBatch(st) == 7L)
    // no staging debris survives a successful commit
    val stray = Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".stage-"))
    assert(stray.isEmpty, s"staging debris left behind: ${stray.mkString(",")}")
    // latestCommitted walks past a manufactured marker-less successor
    val v1 = VersionedState.commit(df, st, 8L)
    assert(new java.io.File(s"$st/v$v1", "_applied_batch").delete())
    assert(VersionedState.lastAppliedBatch(st) == 7L,
      "marker-less latest must read as uncommitted (fall back to v0's id)")
  }

  test("VersionedState: a fully marker-less LEGACY dir reads its newest version, not empty") {
    // pre-r14 state dirs have NO _applied_batch anywhere; treating
    // them as uncommitted would silently discard every accumulated
    // counter (review finding, round 15) — they fall back to the
    // newest version with id -1 (one at-least-once recovery, then
    // every commit is marked)
    val VersionedState = graft.streaming.VersionedState
    val st = java.nio.file.Files.createTempDirectory("vs_legacy").toString
    val df1 = spark.range(3).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    val df2 = spark.range(5).selectExpr("CAST(id AS STRING) AS k", "id AS v")
    VersionedState.commit(df1, st) // marker-less (legacy style)
    VersionedState.commit(df2, st)
    assert(VersionedState.lastAppliedBatch(st) == -1L)
    val got = VersionedState.readCommittedOrEmpty(spark, st, df2.schema)
    assert(got.count() == 5, "legacy dir must read its newest version")
  }

  test("adf_test: Cramer solution matches a driver-side OLS replay") {
    val row = SparkEntry.queries("adf_test")(spark, sf).collect().head
    val n = row.getAs[Long]("n_obs")
    val gamma = row.getAs[Double]("gamma")
    val t = row.getAs[Double]("adf_t")
    assert(n > 30)
    assert(!gamma.isNaN && !t.isNaN)
    // replay: rebuild the series locally and solve the same normal
    // equations with an independent (LU-free) method
    import org.apache.spark.sql.functions.{col, expr, lag}
    val series = graft.core.Tables(spark, sf).orders
      .join(graft.core.Tables(spark, sf).customer
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables(spark, sf).nation
        .select(col("n_nationkey"), col("n_regionkey")), col("c_nationkey") === col("n_nationkey"))
      .join(graft.core.Tables(spark, sf).region
        .select(col("r_regionkey"), col("r_name")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .groupBy((org.apache.spark.sql.functions.year(col("o_orderdate")) * 12 +
        org.apache.spark.sql.functions.month(col("o_orderdate")) - 1).as("m"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) div 100000").as("y"))
      .orderBy("m").collect().map(_.getAs[Long]("y").toDouble)
    val rows = (2 until series.length).map { i =>
      (series(i) - series(i - 1), series(i - 1), series(i - 1) - series(i - 2))
    }
    assert(rows.length == n)
    // 3-param OLS via explicit normal equations (Gaussian elimination)
    val x = rows.map { case (_, y1, d1) => Array(1.0, y1, d1) }
    val yv = rows.map(_._1)
    val xtx = Array.tabulate(3, 3)((a, b) => x.map(r => r(a) * r(b)).sum)
    val xty = Array.tabulate(3)(a => x.zip(yv).map { case (r, v) => r(a) * v }.sum)
    // solve by elimination
    val m2 = xtx.map(_.clone())
    val b = xty.clone()
    for (p <- 0 until 3; r <- 0 until 3 if r != p) {
      val f = m2(r)(p) / m2(p)(p)
      for (c2 <- 0 until 3) m2(r)(c2) -= f * m2(p)(c2)
      b(r) -= f * b(p)
    }
    val coef = Array.tabulate(3)(i => b(i) / m2(i)(i))
    assert(math.abs(coef(1) - gamma) < 1e-8,
      s"gamma replay ${coef(1)} != $gamma")
  }

  test("eigenReplay: degenerate all-zero scatter renorms to the zero vector, no throw") {
    // ADVICE r14: max|w| = 0 divided the replay by zero while the
    // distributed branch NULLed — both now floor the renorm at 1
    val rows = Array((0L, 0L, 0L), (1L, 1L, 0L), (0L, 1L, 0L))
    val out = graft.operators.Ann.eigenReplay(rows, iters = 3, vscale = 1000L).toSeq
    assert(out == Seq((0L, 0L), (1L, 0L)),
      s"zero scatter must fix the zero vector, got $out")
  }

  test("MixPlanSink.start: a RESTARTED stream keeps merging new batches (stable checkpoint)") {
    import graft.streaming.MixPlanSink
    val docs = graft.core.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("source"))
    val in = java.nio.file.Files.createTempDirectory("mix_rs_in").toString
    val st = java.nio.file.Files.createTempDirectory("mix_rs_state").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").json(s"$in/b0")
    val q1 = MixPlanSink.start(spark, s"$in/*", st)
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = MixPlanSink.currentState(spark, st)
      .agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(afterFirst > 0)
    // restart the stream (same state dir, default checkpoint) and feed
    // a NEW file: with a fresh temp checkpoint the ids would restart at
    // 0 ≤ lastAppliedBatch and the guard would silently drop the batch
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").json(s"$in/b1")
    val q2 = MixPlanSink.start(spark, s"$in/*", st)
    try q2.processAllAvailable() finally q2.stop()
    val afterSecond = MixPlanSink.currentState(spark, st)
      .agg(sum(col("n_docs"))).collect().head.getLong(0)
    val want = docs.count()
    assert(afterSecond == want,
      s"restarted stream lost data: $afterSecond of $want docs counted")
  }
}
