package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Quantized unit-normalization in ONE fused primitive loop:
  * m[i] = floor(1000·(double) in[i]); n2 = Σ m[i]²;
  * out[i] = floor(m[i]·10⁶ / sqrt(n2)) — the integer-grid unit vector
  * `embedding_isotropy_audit` sums exactly. Every op is IEEE
  * correctly-rounded in the same order as the staged declarative form
  * (and the DuckDB list comprehensions), so results are bit-identical
  * — but computed once per row instead of paying the interpreted
  * `transform` lambda per element per reference (measured: the
  * declarative chain spent ~10 s on 50k×64 at 10×; this runs the
  * same arithmetic in ~1 s).
  *
  * Zero-norm input returns null (callers filter IS NOT NULL — the
  * declarative twin filtered n2 > 0).
  */
case class QuantUnitVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  // typed rejection of non-float/double element arrays (the
  // RademacherSketch.readElem discipline — getDouble on e.g. an int
  // array silently misreads the buffer)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_qunit expects array<float> or array<double>, got $other")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      m(i) = math.floor(v * 1000.0)
      acc += m(i) * m(i)
      i += 1
    }
    if (acc == 0.0) return null
    val nrm = math.sqrt(acc)
    i = 0
    while (i < n) { m(i) = math.floor(m(i) * 1000000.0 / nrm); i += 1 }
    new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val m = ctx.freshName("m")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $m = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $m[$i] = java.lang.Math.floor($get * 1000.0);
         |  $acc += $m[$i] * $m[$i];
         |}
         |if ($acc == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nrm = java.lang.Math.sqrt($acc);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $m[$i] = java.lang.Math.floor($m[$i] * 1000000.0 / $nrm);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantUnitVector {
  /** Register `graft_qunit` in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qunit", exprs => {
        // arity-checked like the other graft_* registrations: silently
        // dropping extra args (or NoSuchElementException on zero) hides
        // caller bugs behind wrong-but-plausible results (ADVICE r13)
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"graft_qunit expects exactly 1 argument (array<double>), got ${exprs.length}")
        QuantUnitVector(exprs.head)
      }, "scala_udf")
}
