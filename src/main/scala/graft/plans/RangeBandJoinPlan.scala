package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Second whole-operator Catalyst extension (SURVEY.md §2 L, beside
  * [[AsOfJoin]]): a BAND join — probe value v matched to the unique
  * band with lo ≤ v < hi — as a first-class LogicalPlan + Strategy +
  * Exec. The declarative formulation (`StarSchema.rangeBandJoin`)
  * plans as a BroadcastNestedLoopJoin: every probe row is checked
  * against every band — O(n·b) predicate evaluations. This exec
  * declares `BroadcastDistribution` for the band side (Catalyst
  * plants the BroadcastExchange exactly as for a built-in broadcast
  * join) and binary-searches the sorted band edges per probe row:
  * O(n·log b), map-side, zero probe exchanges — the IP2Location-style
  * enrichment shape (`ip_processor.py:1-481`) where b is tens of
  * thousands of CIDR bands, not three.
  *
  * Row contract (positional): probe col 0 = the band key (Long; any
  * further columns pass through untyped), band side = exactly
  * (lo: Long, hi: Long, band_id: Long), non-overlapping — validated
  * when the sorted edge arrays are built (loudly, at plan time on the
  * driver for the codegen path). Output = probe columns +
  * `matched_band` (nullable Long; null = no band covers v).
  */
case class RangeBandJoin(left: LogicalPlan, right: LogicalPlan,
    matchedBand: AttributeReference)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedBand
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(matchedBand))
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): RangeBandJoin = copy(left = newLeft, right = newRight)
}

object RangeBandJoin {
  def apply(left: LogicalPlan, right: LogicalPlan): RangeBandJoin =
    RangeBandJoin(left, right,
      AttributeReference("matched_band", LongType, nullable = true)())
}

case class RangeBandJoinExec(left: SparkPlan, right: SparkPlan,
    matchedBand: AttributeReference)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output :+ matchedBand
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(matchedBand))

  // probe side streams in place; band side arrives as one broadcast
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Sorted (lo, hi, id) edge arrays from the broadcast band rows —
    * validated: ordered, lo < hi, and non-overlapping (the property
    * that makes "the last lo ≤ v" the unique candidate).
    */
  private def edgeArrays(rows: Array[InternalRow]): (Array[Long], Array[Long], Array[Long]) = {
    // a null band field is a broken config table — fail loudly before
    // sorting reads it as 0 and silently mis-shapes the edge arrays
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        "RangeBandJoin: band rows must have non-null (lo, hi, band_id)")
    }
    val sorted = rows.sortBy(_.getLong(0))
    val n = sorted.length
    val lo = new Array[Long](n); val hi = new Array[Long](n); val id = new Array[Long](n)
    var i = 0
    while (i < n) {
      lo(i) = sorted(i).getLong(0); hi(i) = sorted(i).getLong(1); id(i) = sorted(i).getLong(2)
      require(lo(i) < hi(i), s"RangeBandJoin: empty band [${lo(i)}, ${hi(i)})")
      require(i == 0 || hi(i - 1) <= lo(i),
        s"RangeBandJoin: overlapping bands at lo=${lo(i)} (previous hi=${hi(i - 1)})")
      i += 1
    }
    (lo, hi, id)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // edge arrays built and validated ONCE on the driver (matching the
    // codegen path) and re-broadcast in built form — previously every
    // TASK re-sorted and re-validated the band rows (O(b log b) per
    // partition, and validation failures surfaced per-task on
    // executors instead of once at execute time)
    val edgesBc = session.sparkContext.broadcast(
      edgeArrays(right.executeBroadcast[Array[InternalRow]]().value))
    val resultTypes = output.map(_.dataType).toArray
    left.execute().mapPartitions { iter =>
      val (lo, hi, id) = edgesBc.value
      val matchRow = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      val project = UnsafeProjection.create(resultTypes)
      iter.map { p =>
        // a NULL probe key matches no band (null comparisons are false
        // in the declarative twin) — getLong would read it as 0 and
        // silently match the band covering 0
        if (p.isNullAt(0)) matchRow.setNullAt(0)
        else {
          val v = p.getLong(0)
          val r = java.util.Arrays.binarySearch(lo, v)
          val idx = if (r >= 0) r else -r - 2
          if (idx >= 0 && v < hi(idx)) matchRow.setLong(0, id(idx))
          else matchRow.setNullAt(0)
        }
        project(joined(p, matchRow))
      }
    }
  }

  // ---- whole-stage codegen (produce-only: probe rows stream off the
  // iterator, the binary search is generated into the stage body, the
  // sorted edge arrays ride the reference array — already
  // driver-materialized from the tiny broadcast) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] = Seq(left.execute())

  override def needCopyResult: Boolean = false // no mutable cross-row state in outputs

  override protected def doProduce(ctx: CodegenContext): String = {
    val (lo, hi, id) = edgeArrays(right.executeBroadcast[Array[InternalRow]]().value)
    val loTerm = ctx.addReferenceObj("bandLo", lo, "long[]")
    val hiTerm = ctx.addReferenceObj("bandHi", hi, "long[]")
    val idTerm = ctx.addReferenceObj("bandId", id, "long[]")
    val input = ctx.addMutableState("scala.collection.Iterator", "bandProbeInput",
      v => s"$v = inputs[0];")
    val probeRow = ctx.freshName("probeRow")
    val v = ctx.freshName("bandKey")
    val idx = ctx.freshName("bandIdx")
    val matched = ctx.freshName("bandMatched")
    val bid = ctx.freshName("bandIdVal")
    ctx.INPUT_ROW = probeRow
    ctx.currentVars = null
    val probeVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val evaluatedProbe = evaluateVariables(probeVars)
    val bandVar = ExprCode(code"",
      JavaCode.isNullExpression(s"!$matched"), JavaCode.variable(bid, LongType))
    val consumed = consume(ctx, probeVars :+ bandVar)
    val kNull = ctx.freshName("bandKeyNull")
    s"""
       |while ($input.hasNext()) {
       |  InternalRow $probeRow = (InternalRow) $input.next();
       |  boolean $kNull = $probeRow.isNullAt(0);
       |  long $v = $kNull ? 0L : $probeRow.getLong(0);
       |  int $idx; { int r = java.util.Arrays.binarySearch($loTerm, $v); $idx = r >= 0 ? r : -r - 2; }
       |  boolean $matched = !$kNull && $idx >= 0 && $v < $hiTerm[$idx];
       |  long $bid = $matched ? $idTerm[$idx] : -1L;
       |  $evaluatedProbe
       |  $consumed
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): RangeBandJoinExec = copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node onto its exec. */
object RangeBandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeBandJoin(l, r, band) =>
      RangeBandJoinExec(planLater(l), planLater(r), band) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule making the custom node a first-class citizen of
  * predicate pushdown: Catalyst's own PushDownPredicates doesn't know
  * [[RangeBandJoin]] streams its probe child through unchanged, so a
  * filter written ABOVE the band join would otherwise run after it —
  * and, worse, block the probe-side predicate from ever reaching the
  * parquet scan. Conjuncts that reference only probe columns move
  * below the node (where the built-in rules then push them into the
  * scan — plan-tested down to `PushedFilters`); conjuncts touching
  * the generated `matched_band` stay above. A custom operator isn't
  * done when it executes — it's done when the optimizer can see
  * through it.
  */
object PushFilterThroughRangeBandJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j @ RangeBandJoin(left, _, _)) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.withNewChildren(
          Seq(Filter(push.reduce(And), left), j.right)).asInstanceOf[RangeBandJoin]
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Public API for the custom band-join operator. */
object RangeBand {
  /** Band-join `probe` (col 0 = Long key, any passthrough columns
    * after) against `bands` (exactly lo/hi/band_id, all Long,
    * non-overlapping). Idempotently installs the planner strategy.
    */
  def join(spark: SparkSession, probe: DataFrame, bands: DataFrame): DataFrame = {
    require(probe.schema.fields.nonEmpty && probe.schema.fields.head.dataType == LongType,
      s"RangeBand.join probe col 0 must be the Long band key; got ${probe.schema.simpleString}")
    val bf = bands.schema.fields
    require(bf.length == 3 && bf.forall(_.dataType == LongType),
      s"RangeBand.join bands must be exactly (lo: Long, hi: Long, band_id: Long); " +
        s"got ${bands.schema.simpleString}")
    // synchronized: the check-then-append on the session's shared
    // strategy lists races under concurrent first calls (AsOf.join
    // appends to the SAME lists) — a lost append fails the losing
    // query at planning, timing-dependent
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(RangeBandJoinStrategy))
        exp.extraStrategies = exp.extraStrategies :+ RangeBandJoinStrategy
      if (!exp.extraOptimizations.contains(PushFilterThroughRangeBandJoin))
        exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughRangeBandJoin
    }
    GraftSqlShim.ofRows(spark,
      RangeBandJoin(GraftSqlShim.logicalPlan(probe), GraftSqlShim.logicalPlan(bands)))
  }
}
