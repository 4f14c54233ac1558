package graft.functions

/** Engine-exact natural logarithm as shared SQL text.
  *
  * The repo deliberately contains no `ln()` call: JVM `Math.log` is
  * only ~1-ulp accurate and DuckDB's libm `ln` rounds independently,
  * so the same value can hash-diverge between the engines. This
  * builder sidesteps libm entirely: every operation it emits —
  * `sqrt`, `+`, `-`, `*`, `/` and double literals — is IEEE-754
  * CORRECTLY ROUNDED in both engines (Java mandates it for
  * `Math.sqrt` and arithmetic; DuckDB compiles to `sqrtsd` and native
  * double ops; both parse shortest-round-trip literals exactly), so
  * identical expression text evaluates to identical bits.
  *
  * Construction: ln(x) = 64·ln(x^(1/64)) — six nested correctly
  * rounded square roots pull x ∈ [2⁻⁴⁰, 2⁴⁰] into y ∈ [0.648, 1.543];
  * then ln(y) = 2·atanh(z), z = (y−1)/(y+1) ∈ [−0.214, 0.214],
  * via a 14-term odd series in w = z² (next term < 2e-20). (y−1) is
  * exact by Sterbenz' lemma on [0.5, 2], so no cancellation blowup.
  *
  * Accuracy vs true ln: |err| ≲ 2e-14 ABSOLUTE (≈1 ulp per sqrt
  * amplified by the 64× unfold) — analytics-grade, and bit-identical
  * across engines, which is the property the oracle gate needs.
  *
  * Contract: argument must be strictly positive and within
  * [2⁻⁴⁰, 2⁴⁰] ≈ [9.1e-13, 1.1e12]. Probability ratios built from
  * Laplace-smoothed counts with totals < 2⁴⁰ always qualify.
  *
  * Callers stage the intermediate once (`z` references `y` twice and
  * the series references `z` fifteen times — staging keeps the plan
  * and the oracle text linear):
  * {{{
  *   df.withColumn("__y", expr(ExactLn.yExpr("r")))
  *     .withColumn("__z", expr(ExactLn.zExpr("__y")))
  *     .withColumn("ln_r", expr(ExactLn.lnExpr("__z")))
  * }}}
  * with the same three strings spliced into the DuckDB CTE stages.
  */
object ExactLn {

  private val SqrtDepth = 6
  private val Unfold = 1 << SqrtDepth // 64
  private val Terms = 14

  /** Stage 1: y = x^(1/64) via six nested correctly-rounded sqrts. */
  def yExpr(x: String): String =
    Iterator.iterate(s"($x)")(e => s"sqrt($e)").drop(SqrtDepth).next()

  /** Stage 2: z = (y−1)/(y+1), the atanh argument. */
  def zExpr(y: String): String =
    s"((($y) - 1.0) / (($y) + 1.0))"

  /** Stage 3: ln(x) = 64 · 2z · Σ_{k<14} z^{2k}/(2k+1), Horner in z².
    * Coefficients are shortest-round-trip double literals — both
    * engines parse them to the same bits.
    */
  def lnExpr(z: String): String = {
    val coeffs = (1 until Terms).map(k => 1.0 / (2 * k + 1))
    val horner = coeffs.reverse.foldLeft("") { (acc, c) =>
      if (acc.isEmpty) c.toString
      else s"$c + ($z) * ($z) * ($acc)"
    }
    s"(${Unfold.toDouble} * (2.0 * ($z) * (1.0 + ($z) * ($z) * ($horner))))"
  }
}
