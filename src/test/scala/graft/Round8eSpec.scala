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
