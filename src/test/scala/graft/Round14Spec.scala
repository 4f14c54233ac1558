package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins: the two new measured-replay branches (VERDICT r13
  * #2 — triangle_count and embedding_top_eigen regressed on pure
  * stage latency) produce results row-identical to the distributed
  * branches they admit away from.
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("triangle_count: single-task replay equals the distributed wedge join") {
    import graft.operators.Graph
    def row(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val replay = row(Graph.triangleCount(spark, sf))
    graft.core.OwnedCaches.release()
    val dist = row(Graph.triangleCount(spark, sf, forceDistributed = true))
    graft.core.OwnedCaches.release()
    assert(replay == dist, s"replay $replay vs distributed $dist")
    assert(replay.head._3 >= 0 && replay.head._2 > 0)
  }

  test("triangle_count replay body: counts a known graph exactly") {
    import graft.operators.Graph
    // K4 (4 triangles) + a pendant edge + a disconnected K3 (1)
    val k4 = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val es = (k4 :+ (3L, 9L)) ++ Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val (n, m, tri) = Graph.triangleReplay(es.toArray).next()
    assert((n, m, tri) == ((8L, 10L, 5L)))
  }

  test("approx audit queries: invariants hold and exact columns recompute") {
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    // quantile_profile_approx: booleans all true, counts/min/max exact
    val qp = SparkEntry.queries("quantile_profile_approx")(spark, sf).collect()
    graft.core.OwnedCaches.release()
    assert(qp.nonEmpty)
    qp.foreach { r =>
      Seq("p25_ok", "p50_ok", "p75_ok", "p90_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"${r.getAs[String]("o_orderpriority")} $c"))
    }
    val exact = t.orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))).toMap
    qp.foreach { r =>
      val k = r.getAs[String]("o_orderpriority")
      assert((r.getAs[Long]("n_orders"), r.getAs[Double]("min_price"),
        r.getAs[Double]("max_price")) == exact(k))
    }
    // winsorize_approx / anomaly_mad_approx: all booleans true
    for (q <- Seq("winsorize_approx", "anomaly_mad_approx")) {
      val rows = SparkEntry.queries(q)(spark, sf).collect()
      graft.core.OwnedCaches.release()
      assert(rows.nonEmpty, q)
      rows.foreach { r =>
        r.schema.fields.filter(_.dataType.typeName == "boolean").foreach(f =>
          assert(r.getAs[Boolean](f.name), s"$q ${f.name}"))
      }
    }
    // time_to_convert_approx: exact columns match the exact op's
    val ta = SparkEntry.queries("time_to_convert_approx")(spark, sf).collect().head
    graft.core.OwnedCaches.release()
    val te = SparkEntry.queries("time_to_convert")(spark, sf).collect().head
    graft.core.OwnedCaches.release()
    assert(ta.getAs[Boolean]("p50_rank_ok") && ta.getAs[Boolean]("p90_rank_ok"))
    assert(ta.getAs[Long]("n_signup") == te.getAs[Long]("n_signup"))
    assert(ta.getAs[Long]("n_converted") == te.getAs[Long]("n_converted"))
  }

  test("probe-side filters push through AsOfJoin down to the parquet scan") {
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    def probe = t.events.select(col("user_id").as("uid"), col("ts_us"),
      col("event_id"))
    def build = t.orders.select(col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
      col("o_orderkey"))
    val filtered = graft.plans.AsOf.join(spark, probe, build)
      .filter(col("event_id") < 100 && col("matched_key").isNotNull)
    // the probe-only conjunct must sink below the custom node; the
    // matched_key conjunct (a generated column) must stay above it
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(optimized.indexOf("AsOfJoin") < optimized.indexOf("event_id"),
      s"probe filter did not move below the custom node:\n$optimized")
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*LessThan\\(event_id,100\\)".r.findFirstIn(physical).isDefined,
      s"pushed predicate never reached the parquet scan:\n$physical")
    // and the rewrite is semantics-preserving
    val expected = graft.plans.AsOf.join(spark, probe, build)
      .collect().filter(r => r.getLong(2) < 100 && !r.isNullAt(4))
    assert(filtered.count() == expected.length)
  }

  test("embedding_top_eigen: single-task replay equals the distributed iteration") {
    import graft.operators.Ann
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val replay = rows(Ann.embeddingTopEigen(spark, sf))
    graft.core.OwnedCaches.release()
    val dist = rows(Ann.embeddingTopEigen(spark, sf, forceDistributed = true))
    graft.core.OwnedCaches.release()
    assert(replay == dist)
    assert(replay.map(_._1) == replay.map(_._1).sorted && replay.nonEmpty)
  }
}
