package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 sixteenth-wave pins (Jonckheere-Terpstra, PACF). */
class Round13qSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("jonckheere_terpstra: doubled-U replay on the quantized spend grid") {
    val r = SparkEntry.queries("jonckheere_terpstra")(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val t = graft.core.Tables(spark, sf)
    val ab = t.customer
      .selectExpr("c_custkey", "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS ab")
      .collect().map(x => x.getAs[Long]("c_custkey") -> x.getAs[Long]("ab")).toMap
    val sp = t.orders.groupBy("o_custkey")
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)").as("sp"))
      .collect().map(x => x.getAs[Long]("o_custkey") -> x.getAs[Long]("sp")).toMap
    val n = ab.size
    val sortedAb = ab.values.toSeq.sorted
    val thr = (1 to 4).map(j => sortedAb((j * n + 4) / 5 - 1))
    def grade(a: Long): Int = thr.indexWhere(a <= _) match {
      case -1 => 4; case i => i
    }
    val rows = ab.toSeq.map { case (ck, a) =>
      (grade(a), sp.getOrElse(ck, 0L) / 10000)
    }
    var j2 = BigInt(0)
    for (g <- 0 until 5; h <- (g + 1) until 5) {
      val xs = rows.filter(_._1 == g).map(_._2)
      val ys = rows.filter(_._1 == h).map(_._2)
      // 2U = Σ over pairs of 2·[x<y] + 1·[x=y]
      val sx = xs.sorted.toArray
      ys.foreach { y =>
        var lo = 0; var hi = sx.length
        while (lo < hi) { val m = (lo + hi) / 2; if (sx(m) < y) lo = m + 1 else hi = m }
        val below = lo
        var hi2 = sx.length; var lo2 = lo
        while (lo2 < hi2) { val m = (lo2 + hi2) / 2; if (sx(m) <= y) lo2 = m + 1 else hi2 = m }
        val ties = lo2 - below
        j2 += 2 * below + ties
      }
    }
    assert(math.abs(r.getAs[Double]("j_stat") - j2.toDouble / 2) < 1e-6,
      s"J: got ${r.getAs[Double]("j_stat")}, replay ${j2.toDouble / 2}")
    val ng = rows.groupBy(_._1).values.map(_.size.toLong)
    val mu2 = (BigInt(n) * n - ng.map(x => BigInt(x) * x).sum).toDouble / 2
    val sig2x4 = (BigInt(n) * n * (2 * BigInt(n) + 3) -
      ng.map(x => BigInt(x) * x * (2 * BigInt(x) + 3)).sum).toDouble / 18
    val z = (j2.toDouble - mu2) / math.sqrt(sig2x4)
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-9 * (1.0 + math.abs(z)))
  }

  test("pacf_profile: Durbin-Levinson closed forms recompute from the acfs") {
    val r = SparkEntry.queries("pacf_profile")(spark, sf).collect().head
    val r1 = r.getAs[Double]("acf_1"); val r2 = r.getAs[Double]("acf_2")
    val r3 = r.getAs[Double]("acf_3")
    assert(r.getAs[Double]("pacf_1") == r1)
    val p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert(math.abs(r.getAs[Double]("pacf_2") - p2) < 1e-12)
    val a21 = r1 - p2 * r1
    val p3 = (r3 - a21 * r2 - p2 * r1) / (1 - a21 * r1 - p2 * r2)
    assert(math.abs(r.getAs[Double]("pacf_3") - p3) < 1e-12)
    val band = 1.96 / math.sqrt(r.getAs[Long]("n_days").toDouble)
    assert(math.abs(r.getAs[Double]("band_95") - band) < 1e-15)
  }
}
