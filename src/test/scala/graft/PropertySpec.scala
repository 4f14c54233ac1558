package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized-input checks for the custom expressions: the
  * hand-written primitive loops must agree with straightforward Scala
  * reference implementations on arbitrary inputs, not just the corpus
  * (fixed seed — deterministic runs).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Hamilton allocation sums to the budget within floor/floor+1 on random weights") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    for (trial <- 1 to 8) {
      val n = rng.nextInt(30) + 2
      val total = Seq(10L, 997L, 1000000L)(trial % 3)
      val weights = (0 until n).map(i => (s"k$i", rng.nextLong(1000000L) + 1L))
      val rows = graft.operators.Reports.allocate(weights.toDF("n_name", "rev_c"), total)
        .select("n_name", "rev_c", "allocation").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._3).sum == total, s"trial $trial: sum != $total")
      val wTot = weights.map(_._2).sum
      rows.foreach { case (k, w, a) =>
        val fl = total * w / wTot
        assert(a == fl || a == fl + 1, s"trial $trial $k: $a outside [$fl, ${fl + 1}]")
      }
    }
  }

  test("SortedIntersectCount equals Set.intersect on random string sets") {
    import spark.implicits._
    graft.functions.SortedHashes.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    val rng = new scala.util.Random(11)
    val cases = (1 to 30).map { _ =>
      def set() = (0 until rng.nextInt(40) + 1)
        .map(_ => "w" + rng.nextInt(60)).distinct.toList
      (set(), set())
    }
    val got = cases.toDF("a", "b")
      .selectExpr("graft_sorted_intersect(graft_sorted_hashes(a), graft_sorted_hashes(b)) AS n")
      .collect().map(_.getInt(0)).toSeq
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got == want)
  }

  test("RollingHashes equals naive per-window polynomial on random ASCII text") {
    import spark.implicits._
    import graft.functions.RollingHashes
    RollingHashes.register(spark)
    val rng = new scala.util.Random(23)
    val texts = (1 to 30).map { _ =>
      val n = rng.nextInt(120) // includes under-window lengths
      (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString
    }
    val got = texts.toDF("t")
      .selectExpr("graft_rolling_hashes(t) AS fps")
      .collect().map(_.getSeq[Long](0)).toSeq
    val want = texts.map { text =>
      val bs = text.getBytes
      if (bs.length < RollingHashes.K) Seq.empty[Long]
      else (0 to bs.length - RollingHashes.K).map { i =>
        (0 until RollingHashes.K).foldLeft(0L)((a, j) =>
          (a * RollingHashes.B + (bs(i + j) & 0xffL)) % RollingHashes.P)
      }.filter(_ % RollingHashes.SampleMod == 0).distinct.sorted
    }
    assert(got == want)
  }

  test("MinHash signature similarity tracks true Jaccard on related sets") {
    import spark.implicits._
    graft.functions.MinHashSig.register(spark)
    val base = (0 until 60).map(i => s"tok$i")
    for (m <- Seq(0, 10, 30)) {
      val other = base.drop(m) ++ (0 until m).map(i => s"alt$i")
      val Seq(sa, sb) = Seq(base, other).map { s =>
        Seq(s).toDF("s").selectExpr("graft_minhash(s) AS sig")
          .collect()(0).getSeq[Long](0)
      }
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.size
      val trueJ = base.toSet.intersect(other.toSet).size.toDouble /
        base.toSet.union(other.toSet).size
      assert(math.abs(est - trueJ) < 0.3, s"m=$m est=$est true=$trueJ")
    }
  }
}
