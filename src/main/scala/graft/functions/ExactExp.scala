package graft.functions

/** Engine-exact exponential as shared SQL text — [[ExactLn]]'s
  * inverse, built the same way: only IEEE-754 correctly-rounded ops
  * (`+ - * /` and shortest-round-trip double literals), so identical
  * expression text evaluates to identical bits in Spark and DuckDB
  * and exp-derived results survive the hash gate (libm `exp` rounds
  * independently per engine, exactly like `log`).
  *
  * Construction: e^x = (e^(x/64))^64 — the argument shrinks to
  * u ∈ [−0.625, 0.625] where a 17-term Taylor Horner converges past
  * double precision (next term < 1e-19 relative), then six squarings
  * unfold the 64th power. Squaring doubles relative error per level,
  * so the final error is ≈ 64 × (series + rounding) ≈ 3e-15 relative
  * — analytics-grade, and bit-identical across engines.
  *
  * Contract: |x| ≤ 40 (keeps |u| ≤ 0.625 and e^x finite-normal).
  * Log-survival sums, negative log-likelihood totals, and entropy
  * magnitudes from row counts < 2⁴⁰ all qualify.
  *
  * Callers stage the two intermediates (u is referenced 17 times by
  * the series, p is referenced 64 times by the squarings — staging
  * keeps the plan and the oracle text linear):
  * {{{
  *   df.withColumn("__u", expr(ExactExp.uExpr("x")))
  *     .withColumn("__p", expr(ExactExp.pExpr("__u")))
  *     .withColumn("exp_x", expr(ExactExp.expExpr("__p")))
  * }}}
  * with the same three strings spliced into the DuckDB CTE stages.
  */
object ExactExp {

  private val SqDepth = 6
  private val Unfold = 1 << SqDepth // 64
  private val Terms = 17

  /** Stage 1: u = x/64 (exact — division by a power of two). */
  def uExpr(x: String): String = s"(($x) / ${Unfold.toDouble})"

  /** Stage 2: p = e^u via the 17-term Taylor Horner
    * 1 + u·(1 + (u/2)·(1 + (u/3)·(…))) — reciprocal coefficients are
    * shortest-round-trip double literals both engines parse to the
    * same bits.
    */
  def pExpr(u: String): String = {
    val inner = (Terms to 2 by -1).foldLeft("1.0") { (acc, k) =>
      s"(1.0 + ($u) * ${1.0 / k} * ($acc))"
    }
    s"(1.0 + ($u) * $inner)"
  }

  /** Stage 3: e^x = p^64 via six squarings of the staged column. */
  def expExpr(p: String): String =
    Iterator.iterate(s"($p)")(e => s"($e * $e)").drop(SqDepth).next()
}
