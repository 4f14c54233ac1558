package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 scale-hardening: the two priority-class windows rebuilt on
  * the distributed class-rank prefix sum, and the as-of join's
  * generated code proven to actually compile (no silent interpreted
  * fallback).
  */
class ClassWindowSpec extends AnyFunSuite {
  import graft.operators.Analytics
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("ntile_buckets equals the plain per-priority ntile window") {
    val got = Analytics.ntileBuckets(spark, sf).cache()
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val direct = graft.core.Tables(spark, sf).orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("int"))
    assert(got.count() > 0)
    assert(got.except(direct).isEmpty && direct.except(got).isEmpty,
      "distributed ntile disagrees with the window form")
    got.unpersist()
  }

  test("window_percent_rank equals the plain percent_rank/cume_dist window") {
    val got = Analytics.windowPercentRank(spark, sf).cache()
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val direct = graft.core.Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select(col("o_orderkey"), col("o_orderpriority"), col("pct_rank"), col("cume"))
    assert(got.count() > 0)
    assert(got.except(direct).isEmpty && direct.except(got).isEmpty,
      "distributed percent_rank/cume_dist disagrees with the window form")
    got.unpersist()
  }

  test("no window partitioned solely by o_orderpriority runs over raw order rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (df <- Seq(Analytics.ntileBuckets(spark, sf),
        Analytics.windowPercentRank(spark, sf))) {
      val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.nonEmpty)
      // raw-row windows must carry the band key too (≥2 partition
      // exprs); the only single-expr-partitioned window allowed is the
      // per-band offset prefix sum, whose input is one row per band
      // (an aggregate child)
      windows.filter(_.partitionSpec.size < 2).foreach { w =>
        assert(w.collectFirst { case a: Aggregate => a }.isDefined,
          s"window over raw rows partitioned only by ${w.partitionSpec}")
      }
    }
  }
}

class AsOfCodegenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("as-of join generated code compiles (no interpreted fallback)") {
    // spark.sql.codegen.fallback=false turns a janino compile error
    // into a thrown exception instead of a silent interpreted fallback
    // — the plan-string '*(n) AsOfJoin' assertion alone can't tell the
    // difference because the plan renders identically either way
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = graft.operators.Reports.asofEventOrderCustom(spark, sf).count()
      assert(n > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
