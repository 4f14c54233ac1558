package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins: the five coded approx-percentile scale paths
  * (VERDICT r9 #1 — each holds the GK rank-error bound against its
  * exact sibling's value population), the empty-payload chunk guard,
  * the feature_scale degenerate-group gates, and thread-keyed
  * OwnedCaches (r9 ADVICE items).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** GK guarantee: the returned element's rank is within n/accuracy
    * of the target rank (ties widen the valid rank interval).
    */
  private def assertRank(sorted: Array[Double], v: Double, q: Double,
      accuracy: Int, label: String): Unit = {
    val n = sorted.length
    val lo = sorted.count(_ < v) + 1
    val hi = sorted.count(_ <= v)
    val target = q * n
    val err = if (target < lo) lo - target else if (target > hi) target - hi else 0.0
    assert(err <= n.toDouble / accuracy + 1.0,
      s"$label q=$q: value $v rank [$lo,$hi] vs target $target (n=$n)")
    assert(sorted.contains(v), s"$label: approx_percentile must return a data element")
  }

  // Coarse accuracy so the sketch genuinely approximates (compresses)
  // even on the sf0.001 corpus, rather than degenerating to exact.
  private val Coarse = 50

  private lazy val eventValuesByType: Map[String, Array[Double]] =
    graft.core.Tables(spark, sf).events
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        k -> rows.map(_.getDouble(1)).sorted }

  test("anomalyMadApprox holds the GK rank bound for med and mad") {
    val out = graft.operators.Reports.anomalyMadApprox(spark, sf, Coarse)
    val rows = out.collect()
    assert(rows.nonEmpty, "sf0.001 events must surface MAD outliers")
    val perType = rows.map(r => (r.getString(1), r.getDouble(3), r.getDouble(4)))
      .distinct
    for ((et, med, mad) <- perType) {
      val vals = eventValuesByType(et)
      assertRank(vals, med, 0.5, Coarse, s"anomaly_mad med $et")
      val devs = vals.map(v => math.abs(v - med)).sorted
      assertRank(devs, mad, 0.5, Coarse, s"anomaly_mad mad $et")
    }
    // flags are consistent with the reported med/mad
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) / r.getDouble(4) > 3.0)
    }
  }

  test("iqrOutliersApprox holds the GK rank bound for both quartiles") {
    val rows = graft.operators.Reports.iqrOutliersApprox(spark, sf, Coarse).collect()
    assert(rows.nonEmpty, "sf0.001 events must surface IQR outliers")
    for ((et, p25, p75) <- rows.map(r =>
        (r.getString(1), r.getDouble(3), r.getDouble(4))).distinct) {
      val vals = eventValuesByType(et)
      assertRank(vals, p25, 0.25, Coarse, s"iqr p25 $et")
      assertRank(vals, p75, 0.75, Coarse, s"iqr p75 $et")
      assert(p25 <= p75)
    }
  }

  test("winsorizeApprox holds the GK rank bound and clamps consistently") {
    val rows = graft.operators.Reports.winsorizeApprox(spark, sf, Coarse).collect()
    val total = eventValuesByType.values.map(_.length).sum
    assert(rows.length == total, "winsorize is a total map — no rows dropped")
    for ((et, lo, hi) <- rows.map(r =>
        (r.getString(1), r.getDouble(3), r.getDouble(4))).distinct) {
      val vals = eventValuesByType(et)
      assertRank(vals, lo, 0.05, Coarse, s"winsorize lo $et")
      assertRank(vals, hi, 0.95, Coarse, s"winsorize hi $et")
    }
    rows.foreach { r =>
      val (v, lo, hi, w, clamped) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(w == math.max(lo, math.min(hi, v)))
      assert(clamped == (v < lo || v > hi))
    }
  }

  test("timeToConvertApprox holds the GK rank bound on the latency population") {
    val (_, conv) = graft.operators.Commerce.conversionLatencyFrames(spark, sf)
    val lats = conv.select("lat_us").collect().map(_.getLong(0).toDouble).sorted
    assert(lats.length > 10, "sf0.001 must have converted users")
    val r = graft.operators.Commerce.timeToConvertApprox(spark, sf, Coarse).collect()(0)
    assert(r.getLong(1) == lats.length)
    assertRank(lats, r.getLong(3).toDouble, 0.5, Coarse, "ttc p50")
    assertRank(lats, r.getLong(4).toDouble, 0.9, Coarse, "ttc p90")
    // the seconds columns are the same values, one exact divide
    assert(r.getDouble(5) == r.getLong(3) / 1e6)
  }

  test("quantileBandsMonthlyApprox holds the GK rank bound per month") {
    val byMonth = graft.core.Tables(spark, sf).orders
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("m"),
        col("o_totalprice"))
      .collect().groupBy(_.getInt(0)).map { case (k, rows) =>
        k -> rows.map(_.getDouble(1)).sorted }
    val rows = graft.operators.Reports
      .quantileBandsMonthlyApprox(spark, sf, Coarse).collect()
    assert(rows.length == byMonth.size, "one band row per observed month")
    rows.foreach { r =>
      val vals = byMonth(r.getInt(0))
      assert(r.getLong(1) == vals.length)
      assertRank(vals, r.getDouble(2), 0.25, Coarse, s"bands p25 ${r.getInt(0)}")
      assertRank(vals, r.getDouble(3), 0.5, Coarse, s"bands p50 ${r.getInt(0)}")
      assertRank(vals, r.getDouble(4), 0.75, Coarse, s"bands p75 ${r.getInt(0)}")
    }
  }

  test("multimodalChunkAudio emits zero chunks for an empty payload") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    Seq(("d_empty", ""), ("d_short", "abc"), ("d_null", null))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.Multimodal.multimodalChunkAudio(spark, dir).collect()
    // empty and null payloads contribute nothing (Spark's
    // sequence(0, -1) would otherwise fan the empty doc into two
    // spurious rows, one at a negative offset); the 3-byte doc is one
    // short window at offset 0
    assert(out.map(_.getString(0)).toSeq == Seq("d_short"))
    assert(out(0).getInt(1) == 0 && out(0).getInt(2) == 0 && out(0).getInt(3) == 3)
  }

  test("featureScale reports NULL for degenerate groups, values elsewhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    // group A: healthy (n=3, variance>0, mx>mn); group B: single row
    // (sd undefined); group C: two identical rows (zero variance AND
    // mx=mn) — the sd=0 / mx=mn divides DuckDB would send to ±Inf/NaN
    Seq((1L, 1, "A", 10.0), (2L, 1, "A", 20.0), (3L, 1, "A", 40.0),
        (4L, 1, "B", 15.0), (5L, 1, "C", 25.0), (6L, 1, "C", 25.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = graft.operators.Features.featureScale(spark, dir).collect()
      .map(r => r.getString(2) -> (r.get(4), r.get(5))).toMap
    assert(rows("A")._1 != null && rows("A")._2 != null)
    assert(rows("B")._1 == null && rows("B")._2 == null)
    assert(rows("C")._1 == null && rows("C")._2 == null)
  }

  test("deletePropagate cascade is idempotent and leaves no orphans") {
    import graft.operators.Incremental
    val t = graft.core.Tables(spark, sf)
    val batch = t.customer.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("del_key"))
    val (c1, o1, l1) =
      Incremental.deleteCascade(t.customer, t.orders, t.lineitem, batch)
    val counts1 = (c1.count(), o1.count(), l1.count())
    // re-applying the cascade to its own output deletes nothing —
    // the erasure run is safely re-runnable after a partial failure
    val (c2, o2, l2) = Incremental.deleteCascade(c1, o1, l1, batch)
    assert((c2.count(), o2.count(), l2.count()) == counts1)
    val audit = graft.operators.Incremental.deletePropagate(spark, sf).collect()
    assert(audit.map(_.getString(0)).toSeq == Seq("customer", "lineitem", "orders"))
    audit.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "before = deleted + after")
      assert(r.getLong(4) == 0, s"${r.getString(0)}: rebuilt frame must be orphan-free")
    }
    assert(audit.forall(_.getLong(2) > 0), "the 1% batch touches every table")
  }

  test("spacesaving_topk runs in the exact (no-eviction) regime at test SF") {
    // the hash gate vs the GROUP BY oracle is valid only while the
    // per-flag supplier vocabulary fits the capacity — pin that
    val maxVocab = graft.core.Tables(spark, sf).lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("v"))
      .agg(max(col("v"))).collect()(0).getLong(0)
    assert(maxVocab < 4096, s"vocab $maxVocab must sit under SsCapacity")
    val rows = graft.operators.Sketches.spacesavingTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(6)), "Metwally bound holds")
    assert(rows.forall(r => r.getLong(3) == r.getLong(5) && r.getLong(4) == 0L),
      "no eviction => est exact, err 0")
  }

  test("stream-stream as-of join matches batch asof_event_order across micro-batches") {
    import graft.streaming.EventStream
    val evDir = java.nio.file.Files.createTempDirectory("graft_asof_ev").toString
    val orDir = java.nio.file.Files.createTempDirectory("graft_asof_or").toString
    val ev = graft.core.Tables(spark, sf).events
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value")).collect()
    val or = graft.core.Tables(spark, sf).orders
      .selectExpr("o_custkey AS user_id",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS ts_us",
        "o_orderkey AS ord_key").collect()
    // time-tercile split of BOTH sides with one bucketing function:
    // bucket is monotonic in ts, so a build row never lands in a
    // later micro-batch than a probe row it should match — the feed
    // monotonicity the operator's contract asks of its source
    val allTs = (ev.map(_.getLong(1)) ++ or.map(_.getLong(1))).sorted
    val (cut1, cut2) = (allTs(allTs.length / 3), allTs(2 * allTs.length / 3))
    def bucket(ts: Long) = if (ts < cut1) 0 else if (ts < cut2) 1 else 2
    def dump(path: String, lines: Seq[String]): Unit =
      if (lines.nonEmpty) java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), lines.mkString("\n"))
    val q = EventStream.asofJoinStream(spark, evDir, orDir).writeStream
      .outputMode("append").format("memory").queryName("asof_stream").start()
    try {
      for (b <- 0 to 2) {
        dump(s"$orDir/b$b.jsonl", or.filter(r => bucket(r.getLong(1)) == b).map(r =>
          s"""{"user_id":${r.getLong(0)},"ts_us":${r.getLong(1)},"ord_key":${r.getLong(2)}}""").toSeq)
        dump(s"$evDir/b$b.jsonl", ev.filter(r => bucket(r.getLong(1)) == b).map(r =>
          s"""{"event_id":${r.getLong(0)},"ts_us":${r.getLong(1)},"user_id":${r.getLong(2)},"event_type":"${r.getString(3)}","value":${r.getDouble(4)}}""").toSeq)
        q.processAllAvailable()
      }
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => r.getLong(0) ->
          ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
      val got = keyed(spark.table("asof_stream").collect())
      val want = keyed(graft.operators.Reports.asofEventOrder(spark, sf).collect())
      assert(got.size == ev.length, "one match row per probe event")
      assert(got == want, "streaming as-of must equal the batch as-of row-for-row")
    } finally q.stop()
  }

  test("OwnedCaches pending frames are thread-keyed (no cross-drain)") {
    import graft.core.OwnedCaches
    OwnedCaches.release()
    val df = spark.range(10).toDF("x").cache()
    OwnedCaches.own(df)
    assert(OwnedCaches.pendingCount == 1)
    // another thread releasing must NOT drain this thread's frames
    // (the r9 ADVICE race: parallel suites draining each other)
    var otherSaw = -1
    val t = new Thread(() => {
      otherSaw = OwnedCaches.pendingCount
      OwnedCaches.release()
    })
    t.start(); t.join()
    assert(otherSaw == 0, "sibling thread sees its own empty queue")
    assert(OwnedCaches.pendingCount == 1, "frame survives a sibling release()")
    OwnedCaches.release()
    assert(OwnedCaches.pendingCount == 0)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
