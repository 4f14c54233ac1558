package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-sim-bucket recall of the cell-bounded near-dup
  * route vs exact anchored ground truth, with the quantizer LAYOUT
  * selectable — the apples-to-apples read behind SCALE_PROBE_r16's
  * flat-vs-two-level recall table (`embedding_neardup_recall` itself
  * always routes by corpus size, so the off-route layout is only
  * observable here).
  *
  * Usage: runMain graft.tools.RouteRecall <sfDir> <flat|hier> [anchors]
  */
object RouteRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val anchors = if (args.length > 2) args(2).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Ann = graft.operators.Ann
    val (q, nVec) = Ann.quantizedCorpus(spark, dir)
    q.count() // corpus quantize outside both timers
    val t0 = System.nanoTime()
    val (assign, probes) = mode match {
      case "flat" =>
        val (a, _, _, _) = Ann.kmeansAssign(spark, dir)
        (a.select(col("vec_id"), col("cl")), Ann.cellProbes(spark, dir))
      case "hier" => Ann.hierCellFrames(spark, dir)
      case m => sys.error(s"unknown mode $m")
    }
    // phase 1: train + assign + probe (the n·k vs n·√k phase)
    assign.count(); probes.count()
    val tAssign = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val cand = Ann.cellPairScan(assign, probes, q, nVec)
      .select(col("vec_a"), col("vec_b")).withColumn("hit", lit(1L))
    graft.functions.DotProduct.register(spark)
    graft.functions.UnitVector.register(spark)
    val e = graft.core.Tables(spark, dir).embeddings
    def u(idAs: String, uAs: String) = e.select(col("vec_id").as(idAs),
      call_function("graft_unit", col("embedding")).as(uAs))
    val truth = u("vec_a", "ua").filter(col("vec_a") < anchors)
      .join(u("vec_b", "ub"), col("vec_a") < col("vec_b"))
      .filter(call_function("graft_dot", col("ua"), col("ub")) >= Ann.DupThreshold)
      .select(col("vec_a"), col("vec_b"),
        call_function("graft_dot", col("ua"), col("ub")).as("sim"))
    val rows = truth.join(cand, Seq("vec_a", "vec_b"), "left")
      .withColumn("bucket", expr("least(CAST(floor(sim * 10) AS INTEGER), 9)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .orderBy("bucket").collect()
    val tScan = (System.nanoTime() - t1) / 1e9
    rows.foreach { r =>
      val nt = r.getAs[Long]("n_true"); val nh = r.getAs[Long]("n_hit")
      println(f"""{"mode":"$mode","bucket":${r.getAs[Int]("bucket")},"n_true":$nt,"n_hit":$nh,"recall":${nh.toDouble / nt}%.4f}""")
    }
    println(f"""{"mode":"$mode","corpus":$nVec,"k":${Ann.kmKFor(nVec)},"assign_secs":$tAssign%.2f,"scan_secs":$tScan%.2f}""")
    spark.stop()
  }
}
