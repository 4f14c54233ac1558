package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug

/** Per-query generated-code size audit — the execution-mode
  * diagnostic behind VERDICT r15 #1.
  *
  * HotSpot never JIT-compiles a method whose bytecode exceeds
  * `-XX:HugeMethodLimit` (8000 bytes, and `DontCompileHugeMethods`
  * is on by default): a whole-stage-codegen `processNext()` that
  * crosses the limit runs INTERPRETED forever — 10-15× the CPU of
  * the compiled mode — while a sibling stage a few hundred bytes
  * smaller runs compiled. That is a cliff, not a slope: the r15
  * driver bench measured `perplexity_bucket_filter` burning 91.2 s
  * of task CPU where the matched shared run burned 6.7 s on the
  * same binary and data, and the CPU-ratio tail was concentrated on
  * exactly the giant-generated-expression queries (unrolled ExactLn
  * Horner chains, PQ distance tables, 64-way positional
  * equalities). Spark itself only aborts codegen above
  * `spark.sql.codegen.hugeMethodLimit` (default 65535 — the Janino
  * class-file ceiling), so the 8001–65535 band compiles fine,
  * passes every functional test, and silently runs interpreted.
  *
  * This main makes the mode OBSERVABLE per query: for every
  * registered query it walks the executed plan's
  * WholeStageCodegenExec subtrees (via
  * `org.apache.spark.sql.execution.debug.codegenStringSeq`, which
  * compiles each subtree's generated source and reports
  * `ByteCodeStats.maxMethodCodeSize`) and prints one JSON line
  *
  * {{{
  * {"query":NAME,"stages":N,"max_method_bytes":M,
  *  "stages_over_8000":K,"over":["WholeStageCodegen id=..: bytes"]}
  * }}}
  *
  * `stages_over_8000 > 0` = this query HAS a JIT-refused slow mode.
  * The fix is never a JVM flag (raising HugeMethodLimit trades the
  * cliff for a permanently-unoptimized method): shrink the generated
  * code — compact custom Expressions whose doGenCode calls a
  * scalac-compiled (hence normally JIT-able) static method replace
  * unrolled expression text on the Spark side while the DuckDB
  * oracle keeps the textual form (bit-identical by construction:
  * same IEEE ops, same order). CodegenGuardSpec pins the audited
  * registry clean; run this after adding any expression-heavy query.
  *
  * Usage: runMain graft.tools.CodegenAudit <sfDir> [name,name,...]
  */
object CodegenAudit {

  /** Max generated-method bytecode size and the offending stage tags
    * (> limit) for one DataFrame's executed plan. AQE note: the
    * pre-execution `executedPlan` of an AdaptiveSparkPlanExec exposes
    * the initial physical plan's codegen subtrees — exchanges are not
    * yet reoptimized, but expression codegen (the thing that can blow
    * the method limit) is identical in the final plan, and runtime
    * reoptimization only ever SPLITS stages further.
    */
  def audit(df: org.apache.spark.sql.DataFrame,
      limit: Int = 8000): (Int, Int, Seq[String]) = {
    val stages = debug.codegenStringSeq(df.queryExecution.executedPlan)
    val sizes = stages.map { case (subtree, _, stats) =>
      val tag = subtree.linesIterator.find(_.nonEmpty).getOrElse("?").trim
        .take(60)
      (tag, stats.maxMethodCodeSize)
    }
    val over = sizes.filter(_._2 > limit).map { case (t, s) => s"$t: $s" }
    (sizes.size, if (sizes.isEmpty) 0 else sizes.map(_._2).max, over)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE off for the AUDIT only: pre-execution, AdaptiveSparkPlanExec
      // hides its WholeStageCodegen subtrees from plan.collect, and the
      // thing being measured — per-expression generated code size — is
      // identical with and without runtime reoptimization (AQE re-plans
      // exchanges, never expression codegen)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    var worst = 0
    names.foreach { name =>
      val line =
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val (n, mx, over) = audit(df)
          if (mx > worst) worst = mx
          val overJson = over.map(o => "\"" + esc(o) + "\"").mkString("[", ",", "]")
          s"""{"query":"${esc(name)}","stages":$n,"max_method_bytes":$mx,""" +
            s""""stages_over_8000":${over.size},"over":$overJson}"""
        } catch {
          case scala.util.control.NonFatal(e) =>
            s"""{"query":"${esc(name)}","error":"${esc(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120))}"}"""
        }
      println(line)
      graft.core.OwnedCaches.release()
    }
    println(s"""{"audit":"done","queries":${names.size},"worst_method_bytes":$worst}""")
    spark.stop()
  }
}
