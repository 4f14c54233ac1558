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

  test("graph_eccentricity_sample: brute BFS per seed agrees") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("graph_eccentricity_sample")(spark, sf).collect()
      .map(r => r.getAs[Long]("seed_part") ->
        ((r.getAs[Long]("n_reached"), r.getAs[Long]("ecc_bounded")))).toMap
    graft.core.OwnedCaches.release()
    val t = graft.core.Tables(spark, sf)
    val edges = t.lineitem.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("ps")).collect()
      .flatMap(r => r.getSeq[Long](1).sorted.toList.combinations(2).map(x => (x(0), x(1))))
      .groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = t.part.filter(col("p_partkey") <= 6)
      .select("p_partkey").collect().map(_.getLong(0))
    assert(got.keySet == seeds.toSet)
    seeds.foreach { s =>
      var dist = Map(s -> 0L); var frontier = Set(s)
      for (h <- 1 to 4) {
        val nxt = frontier.flatMap(p => adj.getOrElse(p, Set.empty)) -- dist.keySet
        dist ++= nxt.map(_ -> h.toLong); frontier = nxt
      }
      assert(got(s) == ((dist.size.toLong, dist.values.max)), s"seed $s")
    }
  }

  test("corpus_mix_plan: shares sum to 1 and epochs = ceil(repeat_factor)") {
    val rows = SparkEntry.queries("corpus_mix_plan")(spark, sf).collect()
    val k = rows.length
    assert(k > 1)
    val totalTokens = rows.map(_.getAs[Long]("tokens")).sum
    assert(math.abs(rows.map(_.getAs[Double]("natural_share")).sum - 1.0) < 1e-12)
    rows.foreach { r =>
      assert(r.getAs[Double]("target_share") == 1.0 / k)
      val rf = r.getAs[Double]("repeat_factor")
      assert(math.abs(rf - totalTokens.toDouble / k / r.getAs[Long]("tokens")) < 1e-12 * rf)
      assert(r.getAs[Long]("epochs") == math.ceil(rf).toLong)
    }
  }

  test("join_cardinality_audit: exact cardinality equals the executed join;" +
    " estimator recomputes") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("join_cardinality_audit")(spark, sf).collect()
    graft.core.OwnedCaches.release()
    assert(rows.map(_.getAs[Int]("n_buckets")).toSeq == Seq(16, 64, 256))
    val t = graft.core.Tables(spark, sf)
    val actualJoin = t.events.select(col("user_id"))
      .join(t.orders.select(col("o_custkey")), col("user_id") === col("o_custkey"))
      .count()
    rows.foreach { r =>
      assert(r.getAs[Long]("actual_rows") == actualJoin,
        "exact pass must equal the executed join's cardinality")
      assert(r.getAs[Double]("err_pct") ==
        (r.getAs[Long]("est_rows").toDouble - actualJoin.toDouble) / actualJoin.toDouble)
    }
    // brute-force the B=16 containment estimate
    val ek = t.events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ok = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val he = ek.groupBy(_._1 % 16).view.mapValues(v => (v.map(_._2).sum, v.length.toLong))
    val ho = ok.groupBy(_._1 % 16).view.mapValues(v => (v.map(_._2).sum, v.length.toLong))
    val est = he.keys.filter(ho.keySet).map { b =>
      val (re, ke) = he(b); val (ro, ko) = ho(b)
      re * ro / math.max(ke, ko)
    }.sum
    assert(rows.find(_.getAs[Int]("n_buckets") == 16).get.getAs[Long]("est_rows") == est)
  }

  test("ses_grid_search: exact-integer SSE argmin recomputes") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("ses_grid_search")(spark, sf).collect()
      .map(r => r.getAs[String]("region_name") ->
        ((r.getAs[Double]("best_alpha"), r.getAs[Double]("sse_best")))).toMap
    val t = graft.core.Tables(spark, sf)
    val monthly = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getAs[String]("r_name"), r.getAs[Int]("m"), r.getAs[Long]("y")))
    monthly.groupBy(_._1).foreach { case (reg, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      val sses = (1 to 9).map { a =>
        a -> ys.indices.drop(6).map { i =>
          val f = (0 until 6).map(j =>
            a.toLong * math.pow(10 - a, j).toLong * math.pow(10, 5 - j).toLong * ys(i - 1 - j)).sum
          val ae = math.abs(ys(i) * 1000000L - f)
          val h = ae / 10000; val l = ae % 10000
          h * h + (2 * h * l * 10000 + l * l) / 100000000L
        }.sum
      }
      val best = sses.minBy { case (a, s) => (s, a) }
      assert(got(reg) == ((best._1 / 10.0, best._2.toDouble / 10000.0)), reg)
    }
  }

  test("basket_conviction_rules: rule identities recompute from basket_lift's frame") {
    import org.apache.spark.sql.functions._
    val rules = SparkEntry.queries("basket_conviction_rules")(spark, sf).collect()
    graft.core.OwnedCaches.release()
    assert(rules.nonEmpty && rules.length <= 40)
    val t = graft.core.Tables(spark, sf)
    val ob = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = ob.map(_._1).distinct.length.toLong
    val cnt = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pair = ob.groupBy(_._1).values
      .flatMap(_.map(_._2).sorted.combinations(2).map(_.toList)).toSeq
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rules.foreach { r =>
      val x = r.getAs[String]("brand_x"); val y = r.getAs[String]("brand_y")
      val pc = pair(List(x, y).sorted)
      assert(r.getAs[Long]("pair_count") == pc && pc >= 30)
      assert(r.getAs[Double]("confidence") == pc.toDouble / cnt(x))
      if (!r.isNullAt(r.fieldIndex("conviction")))
        assert(r.getAs[Double]("conviction") ==
          ((n - cnt(y)) * cnt(x)).toDouble / (n * (cnt(x) - pc)).toDouble)
      assert(r.getAs[Double]("leverage") ==
        (pc * n - cnt(x) * cnt(y)).toDouble / n.toDouble / n.toDouble)
    }
    // confidence is monotone non-increasing down the emitted ranking
    val confs = rules.map(_.getAs[Double]("confidence"))
    assert(confs.zip(confs.tail).forall { case (a, b) => a >= b })
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
