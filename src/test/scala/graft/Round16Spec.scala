package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 pins for the two-level coarse quantizer (VERDICT r15 #3):
  * the O(n·√k) hierarchy that replaces the flat quantizer's n·k
  * assignment/probe ranking above [[graft.operators.Ann.TwoLevelK]]
  * cells. The hierarchy is FORCED at test size (k = 20 over the
  * sf0.01 corpus — the intended ~25-member cell geometry) so its
  * correctness pins run in the suite while every oracle-gated dir
  * keeps the flat, oracle-replayed branch.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf01 = "/root/testdata/sf0.01"
  private val Ann = graft.operators.Ann

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_a").cast("long"), col("vec_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two-level routing predicate: every oracle-gated dir stays flat, scale dirs route") {
    // sf0.001 (50), sf0.01 (500 — the driver's oracle gate), sf0.1
    // (2000 — the bench dir) all sit at the k floor → flat branch,
    // oracle text untouched; the 10× replica (20k → k=20) and any
    // vector-store scale route hierarchically
    assert(Ann.kmKFor(50) <= Ann.TwoLevelK)
    assert(Ann.kmKFor(500) <= Ann.TwoLevelK)
    assert(Ann.kmKFor(2000) <= Ann.TwoLevelK)
    assert(Ann.kmKFor(16000) <= Ann.TwoLevelK)
    assert(Ann.kmKFor(20000) > Ann.TwoLevelK)
    assert(Ann.kmKFor(1000000000L) > Ann.TwoLevelK)
  }

  test("forced two-level quantizer: assignment partitions the corpus, probes bounded and home-covering") {
    val (assign, probes, _) = Ann.hierCellFrames(spark, sf01, Some(20))
    val n = graft.core.Tables(spark, sf01).embeddings.count()
    assert(assign.count() == n, "every vector gets exactly one home cell")
    assert(assign.select("vec_id").distinct().count() == n)
    val perVec = probes.groupBy("va").count()
      .agg(count(lit(1)).as("nv"), min("count").as("lo"), max("count").as("hi"))
      .collect()(0)
    assert(perVec.getLong(0) == n, "every vector probes at least one cell")
    assert(perVec.getLong(1) >= 1 && perVec.getLong(2) <= Ann.nprobeFor(20) + 1,
      "probe fan-out must stay within the corpus-scaled width plus the unioned home cell")
    // the home cell ALWAYS rides in the probe set (the in-cell-pair
    // guarantee the flat layout gives by construction)
    val missing = assign.select(col("vec_id").as("va"), col("cl"))
      .join(probes, Seq("va", "cl"), "left_anti").count()
    assert(missing == 0, s"$missing vectors do not probe their own home cell")
  }

  test("forced two-level pair scan: recall vs the exact near-dup pair set") {
    val exact = pairSet(Ann.dedupEmbeddingCosine(spark, sf01)) // flat/exact branch at 500
    assert(exact.nonEmpty, "test data must contain near-dup pairs")
    val (assign, probes, ring) = Ann.hierCellFrames(spark, sf01, Some(20))
    val (q, n) = Ann.quantizedCorpus(spark, sf01)
    val hier = pairSet(Ann.cellPairScan(assign, probes, q, n, Some(ring)))
    val recall = (exact & hier).size.toDouble / exact.size
    assert(recall >= 0.8, s"two-level pair recall $recall below floor (0.8)")
    // precision is structural: the scan verifies every candidate with
    // the exact micro-unit cosine before emitting, so emitted pairs
    // are genuine τ-near-dups on the micro grid regardless of layout
    assert(hier.forall { case (a, b) => a < b }, "canonical vec_a < vec_b")
  }
}
