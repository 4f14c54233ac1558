package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Round-13 eleventh-wave pin: sampled-source Brandes betweenness. */
class Round13lSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("betweenness_sample: matches a driver-side hop-bounded Brandes replay") {
    val out = SparkEntry.queries("betweenness_sample")(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    // scores must be non-increasing with deterministic tiebreak
    out.sliding(2).foreach { case Array(a, b) =>
      val sa = a.getAs[Double]("betweenness"); val sb = b.getAs[Double]("betweenness")
      assert(sa > sb || (sa == sb && a.getAs[Long]("part_key") < b.getAs[Long]("part_key")))
    case _ => ()
    }

    // replay: same graph, same 8 sources, same 4-hop horizon
    import org.apache.spark.sql.functions._
    val und = graft.core.Tables(spark, sf).lineitem
      .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("b"))
      .select(explode(col("b")).as("p1"), col("b"))
      .select(col("p1"), explode(col("b")).as("p2"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")))
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    val srcs = adj.toSeq.map { case (p, ns) => (p, ns.size) }
      .sortBy { case (p, d) => (-d, p) }.take(8).map(_._1)
    val score = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    srcs.foreach { s =>
      val sig = mutable.Map(s -> 1L)
      val level = mutable.Map(s -> 0)
      var frontier = Seq(s)
      val byLevel = mutable.ArrayBuffer(Seq(s))
      for (l <- 1 to 4) {
        val next = mutable.Map.empty[Long, Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Nil).foreach { w =>
            if (!level.contains(w))
              next(w) = next.getOrElse(w, 0L) + sig(v)
          }
        }
        next.foreach { case (w, c) => sig(w) = c; level(w) = l }
        frontier = next.keys.toSeq
        byLevel += frontier
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (l <- 3 to 1 by -1) {
        byLevel(l).foreach { v =>
          var d = 0.0
          adj(v).foreach { w =>
            if (level.getOrElse(w, -1) == l + 1)
              d += sig(v).toDouble / sig(w) * (1.0 + delta(w))
          }
          delta(v) = d
          score(v) += d
        }
      }
    }
    val expTop = score.toSeq.sortBy { case (p, sc) => (-sc, p) }.take(20)
    out.zip(expTop).foreach { case (row, (p, sc)) =>
      assert(row.getAs[Long]("part_key") == p,
        s"rank mismatch: got ${row.getAs[Long]("part_key")}, replay $p")
      assert(math.abs(row.getAs[Double]("betweenness") - sc) < 1e-6 * (1.0 + sc),
        s"score mismatch at $p: got ${row.getAs[Double]("betweenness")}, replay $sc")
    }
  }
}
