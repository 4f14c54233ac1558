package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 plan-shape pins for the single-scan window rewrites: the
  * point of the q2/q17/q20 rewrite was ONE pass over lineitem — a
  * regression back to aggregate-then-join would re-introduce the
  * second scan silently, so pin the scan count in the executed plan.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // only the final plan reflects what actually ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q2/q17/q20 read lineitem exactly once") {
    import graft.operators.DecisionSupport
    // count occurrences of the lineitem path in the executed plan —
    // file scans embed the location, so the table name appears once
    // per scan operator
    def liScans(plan: String): Int = "lineitem".r.findAllIn(plan).length
    val q2 = executedPlan(DecisionSupport.q2MinCostSupplier(spark, sf))
    assert(liScans(q2) <= 1, s"q2 scans lineitem more than once:\n$q2")
    val q17 = executedPlan(DecisionSupport.q17SmallQuantity(spark, sf))
    assert(liScans(q17) <= 1, s"q17 scans lineitem more than once:\n$q17")
    val q20 = executedPlan(DecisionSupport.q20PartSupply(spark, sf))
    assert(liScans(q20) <= 1, s"q20 scans lineitem more than once:\n$q20")
    val q21 = executedPlan(DecisionSupport.q21WaitingSupplier(spark, sf))
    assert(liScans(q21) <= 1, s"q21 scans lineitem more than once:\n$q21")
  }

  test("corr_profile reads lineitem once; hll_rollup reads events once") {
    val corr = executedPlan(graft.operators.Reports.corrProfile(spark, sf))
    assert("lineitem".r.findAllIn(corr).length <= 1,
      s"corr moments should come from one scan:\n$corr")
    // the rollup's three levels must read the cached register table,
    // not re-scan the raw log per level
    val roll = executedPlan(graft.operators.Sketches.hllRollup(spark, sf))
    assert("events".r.findAllIn(roll).length <= 1,
      s"hll_rollup must build registers from one raw pass:\n$roll")
    assert(roll.contains("InMemoryTableScan") || roll.contains("TableCacheQueryStage"),
      "register levels should read the cached register table")
  }

  test("map-only text operators carry no exchange before their output sort") {
    // doc_chunk and winnowing_fp are pure per-doc fan-outs/projections:
    // the ONLY exchange in the plan may be the final presentation sort
    for ((name, df) <- Seq(
        "doc_chunk" -> graft.operators.TextAnalysis.docChunk(spark, sf),
        "winnowing_fp" -> graft.operators.TextAnalysis.winnowingFp(spark, sf))) {
      val plan = executedPlan(df)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val range = "rangepartitioning".r.findAllIn(plan).length
      assert(exchanges <= range + 1,
        s"$name should be map-side up to the output sort:\n$plan")
    }
  }
}
