package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 thirteenth-wave pins (isotropy audit, partial
  * correlation, Bartlett). */
class Round13nSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("embedding_isotropy_audit: sum-vector identity matches the brute-force" +
    " pairwise mean on the quantized unit vectors") {
    val r = rows("embedding_isotropy_audit").head
    val n = r.getAs[Long]("n_vectors")
    val d = r.getAs[Long]("dim")
    assert(math.abs(r.getAs[Double]("mean_unit_norm2") - 1.0) < 2.0 * d / 1e6,
      "quantized unit norms must sit within the floor-residue band")
    // brute force on the driver over the same quantized vectors
    val vecs = graft.core.Tables(spark, sf).embeddings
      .collect().map { row =>
        val e = row.getAs[scala.collection.Seq[Float]]("embedding").toArray
        val m = e.map(v => math.floor(v.toDouble * 1000))
        val n2 = m.map(x => x * x).sum
        m.map(x => math.floor(x * 1e6 / math.sqrt(n2)))
      }
    assert(vecs.length == n)
    var acc = 0.0
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      var dot = 0.0
      var k = 0
      while (k < vecs(i).length) { dot += vecs(i)(k) * vecs(j)(k); k += 1 }
      acc += dot / 1e12
    }
    val brute = 2.0 * acc / (n.toDouble * (n - 1))
    val got = r.getAs[Double]("mean_pairwise_cosine")
    assert(math.abs(got - brute) < 1e-9,
      s"identity: got $got, brute-force $brute")
  }

  test("partial_correlation: partials recompute from the published pairwise r's") {
    val r = rows("partial_correlation").head
    val rqp = r.getAs[Double]("corr_qty_price")
    val rqd = r.getAs[Double]("corr_qty_disc")
    val rdp = r.getAs[Double]("corr_disc_price")
    Seq(rqp, rqd, rdp).foreach(v => assert(v >= -1.0 && v <= 1.0))
    def partial(rxy: Double, rxz: Double, ryz: Double): Double =
      (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("partial_qty_price") - partial(rqp, rqd, rdp)) < 1e-12)
    assert(math.abs(r.getAs[Double]("partial_qty_disc") - partial(rqd, rqp, rdp)) < 1e-12)
    assert(math.abs(r.getAs[Double]("partial_disc_price") - partial(rdp, rqd, rqp)) < 1e-12)
  }

  test("bartlett_test: matches a driver-side libm recompute") {
    val r = rows("bartlett_test").head
    assert(r.getAs[Int]("k_groups") == 5 && r.getAs[Int]("dof") == 4)
    import org.apache.spark.sql.functions._
    val m = graft.core.Tables(spark, sf).events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), sum(expr("c * c")).as("ss"))
      .collect().map(x => (x.getAs[Long]("n"), x.getAs[Long]("s"), x.getAs[Long]("ss")))
    val k = m.length
    val nn = m.map(_._1).sum
    val vars = m.map { case (n, s, ss) => (ss - s.toDouble * s / n) / (n - 1.0) }
    val vp = m.zip(vars).map { case ((n, _, _), v) => (n - 1.0) * v }.sum / (nn - k)
    val chi2num = (nn - k) * math.log(vp) -
      m.zip(vars).map { case ((n, _, _), v) => (n - 1.0) * math.log(v) }.sum
    val c = 1.0 + (m.map(x => 1.0 / (x._1 - 1.0)).sum - 1.0 / (nn - k)) / (3.0 * (k - 1))
    val expect = chi2num / c
    val got = r.getAs[Double]("bartlett_chi2")
    assert(math.abs(got - expect) < 1e-6 * (1.0 + math.abs(expect)),
      s"chi2: got $got, recomputed $expect")
    assert(r.getAs[Int]("significant") == (if (got > 9.488) 1 else 0))
  }
}
