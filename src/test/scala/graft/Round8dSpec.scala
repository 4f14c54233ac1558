package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions, batch 4: fuzzy entity resolution, interval
  * overlap join, SemDeDup pruning.
  */
class Round8dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy deletion-neighborhood blocking is COMPLETE vs the brute-force join") {
    import spark.implicits._
    // adversarial dictionary: empty + length-1/2 edges, plus a seeded
    // random small-alphabet set where distance-≤2 pairs are dense
    val rnd = new scala.util.Random(42)
    val dict = (Seq("", "a", "b", "ab", "ba", "abc", "axc", "hello", "hallo") ++
      Seq.fill(40)((0 until (rnd.nextInt(6) + 1)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString))
      .distinct
    val names = dict.map(n => (n, 1L)).toDF("name", "cnt")
    val got = graft.operators.Dedup.fuzzyPairs(names)
      .select("name_a", "name_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      a <- dict; b <- dict if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "degenerate test: no qualifying pairs")
  }

  test("session_overlap counts each overlapping pair exactly once (brute-force replay)") {
    val sessions = graft.operators.Analytics.sessionize(spark, sf)
      .select("user_id", "session_seq", "session_start_us", "session_end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (for {
      (ua, sa, a1, b1) <- sessions; (ub, sb, a2, b2) <- sessions
      if (ua < ub || (ua == ub && sa < sb)) && a1 <= b2 && a2 <= b1
    } yield java.time.Instant.ofEpochSecond(0, math.max(a1, a2) * 1000)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Analytics.sessionOverlap(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"per-day pair counts diverge: got=$got want=$want")
    assert(want.values.sum > 0, "degenerate test: no overlaps at this SF")
  }

  test("knn_graph: dense ranks, within-cell exactness, recall ≥ 0.5 vs brute force") {
    val got = graft.operators.Ann.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byVec = got.groupBy(_._1)
    byVec.foreach { case (v, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"vec $v: ranks not dense")
      val sims = rows.sortBy(_._3).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"vec $v: sims increase with rank")
    }
    // brute-force top-3 on the same quantized grid
    val vecs = graft.core.Tables(spark, sf).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6)).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val hits = vecs.map { case (v, qa) =>
      val brute = vecs.filter(_._1 != v)
        .map { case (u, qb) => (u, cos(qa, qb)) }
        .sortBy { case (u, s) => (-s, u) }.take(3).map(_._1).toSet
      val mine = byVec.getOrElse(v, Array.empty).map(_._2).toSet
      (brute & mine).size.toDouble / brute.size
    }
    val recall = hits.sum / hits.length
    assert(recall >= 0.5, s"cell-local kNN recall too low: $recall")
  }

  test("gini_profile stats re-derive from raw value counts") {
    val got = graft.etl.QualityChecks.giniProfile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val o = graft.core.Tables(spark, sf).orders.collect()
    for ((cname, idx) <- Seq(("o_orderpriority", 5), ("o_orderstatus", 2))) {
      val counts = o.map(_.getString(idx)).groupBy(identity).view.mapValues(_.size.toLong)
      val n = counts.values.sum
      val gini = 1.0 - counts.values.map(c => c * c).sum.toDouble / (n * n).toDouble
      val top = counts.values.max.toDouble / n.toDouble
      val row = got(cname)
      assert(row._1 == counts.size.toLong && row._2 == gini && row._3 == top,
        s"$cname: got=$row want=(${counts.size},$gini,$top)")
    }
  }

  test("containment flags short-in-long duplicates that Jaccard misses, with directions") {
    import spark.implicits._
    graft.functions.TokenShingles.register(spark)
    val words = (1 to 60).map(i => s"w$i")
    val long = words.mkString(" ") // 60 tokens
    val quote = words.take(15).mkString(" ") // fully contained prefix
    val half = (words.take(8) ++ (1 to 20).map(i => s"z$i")).mkString(" ") // weak overlap
    val docs = Seq(
      (1L, long), (2L, quote), (3L, half),
      (4L, long), // exact duplicate of 1 → mutual
      (5L, (1 to 40).map(i => s"q$i").mkString(" ")) // disjoint
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(7)).toMap
    // the 15-token quote inside the 60-token doc: Jaccard = 10/55 ≈ 0.18
    // (10 of 55 distinct 6-gram positions shared) — far below any dedup
    // threshold, but coverage of the quote is 10/10 = 1.0
    assert(got.get((1L, 2L)).contains("b_in_a"), s"quote-in-doc missed: $got")
    assert(got.get((2L, 4L)).contains("a_in_b"))
    assert(got.get((1L, 4L)).contains("mutual"), "exact dup must be mutual")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "weak overlap must stay below the threshold")
    assert(!got.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("semdedup verdicts match the greedy smaller-id rule, computed independently") {
    val verdicts = graft.operators.Ann.semdedupPrune(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = verdicts.map(v => v._1 -> v._2).toMap
    val vecs = graft.core.Tables(spark, sf).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6)).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    verdicts.foreach { case (id, cl, kept) =>
      val hasSmallerDup = vecs.keys.exists(o =>
        o < id && byId(o) == cl && cos(vecs(o), vecs(id)) >= 0.4)
      assert(kept == !hasSmallerDup,
        s"vec $id in cluster $cl: kept=$kept but smaller-id dup exists=$hasSmallerDup")
    }
    // both verdict branches live
    assert(verdicts.exists(!_._3) && verdicts.exists(_._3))
  }
}
