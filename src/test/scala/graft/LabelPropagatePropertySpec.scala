package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

/** Property pin for the connected-components primitive under the
  * whole dedup-clusters family ([[graft.operators.Dedup.labelPropagate]]):
  * on RANDOM pair lists, the single-task union-find branch, the
  * fully-partitioned min-label propagation branch, and a brute-force
  * transitive closure all agree — the oracle dataset exercises one
  * graph shape; this exercises many (chains, cliques, isolated pairs,
  * duplicate edges) with deterministic generator seeds.
  */
class LabelPropagatePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bruteComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(pairs: Seq[(Long, Long)], forcePartitioned: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    graft.operators.Dedup.labelPropagate(df, forcePartitioned = forcePartitioned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("both labelPropagate branches equal brute-force components on random graphs") {
    val genPairs: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 40) // node-id space
      m <- Gen.choose(1, 60) // edge count (duplicates allowed)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      if pairs.nonEmpty
    } yield pairs
    // deterministic seeds: a property-test failure must reproduce
    val cases = (1 to 8).flatMap { i =>
      genPairs(Gen.Parameters.default, Seed(i.toLong)).toList
    }
    assert(cases.nonEmpty)
    cases.foreach { pairs =>
      val want = bruteComponents(pairs)
      val uf = run(pairs, forcePartitioned = false)
      assert(uf == want, s"union-find branch diverged on $pairs")
      val part = run(pairs, forcePartitioned = true)
      assert(part == want, s"partitioned branch diverged on $pairs")
    }
  }

  test("chain graph (worst-case diameter) converges to one component on both branches") {
    // a 60-node path is the propagation loop's diameter stress: the
    // min label must walk the whole chain
    val chain = (0L until 59L).map(i => (i, i + 1))
    val want = chain.flatMap(p => Seq(p._1, p._2)).distinct.map(_ -> 0L).toMap
    assert(run(chain, forcePartitioned = false) == want)
    assert(run(chain, forcePartitioned = true) == want)
  }
}
