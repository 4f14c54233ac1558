package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions, batch 5: skyline (pareto frontier) and
  * sequential-pattern mining.
  */
class Round8eSpec extends AnyFunSuite {
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("pareto_frontier equals brute-force pairwise dominance") {
    val all = graft.core.Tables(spark, sf).orders
      .select(col("o_orderkey"),
        (graft.functions.GraftFunctions.money(col("o_totalprice")) * 100).cast("long").as("xc"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = all.filter { case (_, x, y) =>
      !all.exists { case (_, x2, y2) => x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._1).toSet
    val got = graft.operators.Reports.paretoFrontier(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty && want.size < all.length, "degenerate frontier")
  }

  test("pareto_frontier's only unpartitioned window sits on the per-band aggregate") {
    val df = graft.operators.Reports.paretoFrontier(spark, sf)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val (global, partitioned) = wins.partition(_.partitionSpec.isEmpty)
    assert(partitioned.nonEmpty, "the raw-row prefix max must be band/price-partitioned")
    assert(global.size == 1, s"expected exactly 1 band-offset window, got ${global.size}")
    assert(global.head.child.collectFirst { case a: Aggregate => a }.isDefined,
      "the global window must consume the one-row-per-band aggregate, not raw orders")
  }

  test("bfs_hops equals a sequential BFS over the same edge set") {
    val got = graft.operators.Graph.bfsHops(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the support-filtered co-purchase edges independently
    val li = graft.core.Tables(spark, sf).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted.toList
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = graft.core.Tables(spark, sf).part
      .filter(col("p_brand") === "Brand#1")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    var dist = seeds.map(_ -> 0L).toMap
    for (h <- 1 to 3) {
      val frontier = dist.filter(_._2 == h - 1).keys
      val next = frontier.flatMap(p => adj.getOrElse(p, Set.empty[Long])).toSet
      dist = dist ++ next.filterNot(dist.contains).map(_ -> h.toLong)
    }
    assert(got == dist,
      s"missing=${(dist.toSet -- got.toSet).take(5)} extra=${(got.toSet -- dist.toSet).take(5)}")
    assert(dist.values.toSet.size > 1, "degenerate: all nodes at one hop")
  }

  test("cusum window identity equals the textbook sequential recurrence") {
    val daily = graft.core.Tables(spark, sf).events
      .select(col("event_type"),
        timestamp_micros(col("ts_us")).cast("date").cast("string").as("d"),
        (graft.functions.GraftFunctions.money(col("value")) * 100).cast("long").as("xc"))
      .groupBy("event_type", "d").agg(sum("xc").as("xc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = graft.operators.Reports.cusumAlerts(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val xs = rows.sortBy(_._2)
      val n = xs.length.toLong
      val total = xs.map(_._3).sum
      // textbook S_t = max(0, S_{t-1} + (x_t - mean)), run in exact
      // n-scaled cents: R_t = max(0, R_{t-1} + n*x_t - total)
      var r = 0L
      xs.foreach { case (_, day, xc) =>
        r = math.max(0L, r + n * xc - total)
        val want = r.toDouble / (n * 100L).toDouble
        assert(got((typ, day)) == want,
          s"($typ, $day): window identity ${got((typ, day))} != recurrence $want")
      }
    }
  }

  test("budget_allocate hits the total exactly with largest-remainder integers") {
    val rows = graft.operators.Reports.budgetAllocate(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 1000000L, "allocations must sum to the budget exactly")
    // every allocation within 1 unit of the exact proportional share
    val revC = rows.map(r => r._1 -> math.round(r._2 * 100)).toMap
    val tot = revC.values.sum
    rows.foreach { case (n, _, alloc) =>
      val exact = 1000000.0 * revC(n) / tot
      assert(alloc >= math.floor(exact).toLong && alloc <= math.floor(exact).toLong + 1,
        s"$n: $alloc outside [floor, floor+1] of $exact")
    }
    // the remainder branch is live: floors alone must NOT hit the total
    val floorSum = rows.map { case (n, _, _) => 1000000L * revC(n) / tot }.sum
    assert(floorSum < 1000000L, "degenerate: no leftover units to distribute")
  }

  test("event_regex_match equals a journey-string replay") {
    val ev = graft.core.Tables(spark, sf).events
      .select(col("user_id"), timestamp_micros(col("ts_us")).cast("date").cast("string").as("d"),
        col("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val journeys = ev.groupBy(r => (r._1, r._2)).values.map { rows =>
      rows.sortBy(r => (r._3, r._4)).map(_._5.head).mkString
    }.toSeq
    val want = Map(
      "funnel_view_click_purchase" -> journeys.count(j => "v.*c.*p".r.findFirstIn(j).isDefined).toLong,
      "signup_first" -> journeys.count(_.startsWith("s")).toLong,
      "error_burst" -> journeys.count(_.contains("ee")).toLong)
    val got = graft.operators.Analytics.eventRegexMatch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("anomaly_mad flags tail rows the mean-skewed z-score masks") {
    val mad = graft.operators.Reports.anomalyMad(spark, sf).collect()
    assert(mad.nonEmpty)
    mad.foreach { r =>
      assert(r.getAs[Double]("mad_ratio") > 3.0)
      assert(math.abs(r.getAs[Double]("mad_ratio") -
        math.abs(r.getAs[Double]("value") - r.getAs[Double]("med")) / r.getAs[Double]("mad")) == 0.0)
    }
    // the point of the robust variant: detections the z-score misses
    // because heavy outliers drag the mean/σ toward themselves
    val zIds = graft.operators.Reports.anomalyZscore(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val madOnly = mad.map(_.getAs[Long]("event_id")).toSet -- zIds
    assert(madOnly.nonEmpty, "expected MAD to flag rows z-score masks on this data")
  }

  test("winsorize clamps exactly the out-of-band rows, order-preserving") {
    val rows = graft.operators.Reports.winsorize(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val bounds = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._3).min, rs.map(_._3).max) }.toMap
    rows.foreach { case (typ, v, w, clamped) =>
      assert(clamped == (v != w), s"$typ: flag disagrees with value change")
      val (lo, hi) = bounds(typ)
      assert(w >= lo && w <= hi)
      // clamping is monotone: outside values land ON a bound
      if (clamped) assert(w == lo || w == hi)
    }
    assert(rows.exists(_._4) && rows.exists(!_._4), "both branches must be live")
  }

  test("path_topk matches brute-force triple counting") {
    val ev = graft.core.Tables(spark, sf).events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).filter(_.size == 3)
        .map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = graft.operators.Analytics.pathTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got=$got want=$want")
  }
}
