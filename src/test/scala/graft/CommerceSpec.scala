package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Customer-behavior marts (Commerce.scala): the distributed-rank RFM
  * scoring must equal the single-window ntile it re-expresses, and the
  * streak/basket outputs must satisfy their internal invariants.
  */
class CommerceSpec extends AnyFunSuite {
  import graft.operators.Commerce
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("rfm distributed ranks equal the unpartitioned ntile windows") {
    // recompute the three scores with plain global windows (the thing
    // globalRowNumber deliberately avoids) and diff — must be empty
    val rfm = Commerce.rfmSegment(spark, sf).cache()
    val wr = Window.orderBy(col("recency_days"), col("c_custkey"))
    val wf = Window.orderBy(col("frequency").desc, col("c_custkey"))
    val wm = Window.orderBy(col("monetary").desc, col("c_custkey"))
    val direct = rfm.select(col("c_custkey"), col("recency_days"),
        col("frequency"), col("monetary"),
        ntile(4).over(wr).cast("long").as("r_score"),
        ntile(4).over(wf).cast("long").as("f_score"),
        ntile(4).over(wm).cast("long").as("m_score"))
    assert(rfm.except(direct).isEmpty && direct.except(rfm).isEmpty,
      "two-level prefix-sum ntile diverged from the window ntile")
    // quartiles are balanced: each score bucket holds n/4 ± 1 customers
    val n = rfm.count()
    val bySc = rfm.groupBy("r_score").count().collect().map(_.getLong(1))
    assert(bySc.length == 4 && bySc.forall(c => math.abs(c - n / 4.0) <= 1))
    rfm.unpersist()
  }

  test("rfm rank windows are all bucket-partitioned (no single-task global sort)") {
    val plan = Commerce.rfmSegment(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // per-bucket row_number windows ARE partitioned; the only empty
    // partitionBy windows allowed are the bucket-offset prefix sums,
    // whose input is one row per bucket (an aggregate child)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(windows.nonEmpty)
    assert(unpartitioned.forall(_.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined), "a global window runs over raw (non-aggregated) rows")
  }

  test("retention cohorts: offset 0 is the full cohort, rates never exceed 1") {
    val r = Commerce.retentionCohorts(spark, sf).collect()
    assert(r.nonEmpty)
    r.filter(_.getLong(1) == 0L).foreach { row =>
      assert(row.getLong(2) == row.getLong(3), "cohort incomplete at offset 0")
      assert(row.getDouble(4) == 1.0)
    }
    assert(r.forall(row => row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0))
  }

  test("basket lift: marginals reproduce each pair's lift and confidence") {
    val rows = Commerce.basketLift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_.getLong(2) >= 30), "min-support filter leaked")
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
    // lifts arrive sorted descending (ties broken by brand pair)
    val lifts = rows.map(_.getDouble(3))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("gap islands: streak invariants vs the raw distinct-day counts") {
    val t = graft.core.Tables(spark, sf)
    val res = Commerce.gapIslands(spark, sf).collect()
    val days = t.events
      .select(col("user_id"), timestamp_micros(col("ts_us")).cast("date").as("d"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res.nonEmpty)
    res.foreach { r =>
      val (user, streaks, longest, active) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(active == days(user), "streak lengths must sum to active days")
      assert(longest <= active && streaks >= 1 && longest >= 1)
      assert(streaks * longest >= active, "longest streak bound violated")
    }
  }

  test("classRowNumber keeps NULL class/bucket keys (window PARTITION BY parity)") {
    import spark.implicits._
    // NULL is a valid window partition: rows with a NULL class must
    // rank among themselves, not vanish through the offset join
    val df = Seq(
      (Option("a"), 3L), (Option("a"), 1L), (Option("a"), 2L),
      (Option.empty[String], 5L), (Option.empty[String], 4L)
    ).toDF("cls", "v")
    val got = Commerce.classRowNumber(df, Seq("cls"), col("v"), Seq(col("v")), "rk")
    assert(got.count() == 5, "NULL-keyed rows were dropped by the offset join")
    val want = df.withColumn("rk",
      row_number().over(Window.partitionBy("cls").orderBy("v")).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "NULL-partition ranks diverged from the window row_number")
  }
}
