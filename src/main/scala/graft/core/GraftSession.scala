package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions hook: registers graft's Catalyst functions
  * at session build time — usable via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.core.GraftExtensions`, after which
  * `graft_dot` / `graft_shingles` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.TokenShingles].getName, "graft_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TokenShingles(exprs.head,
          exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.MinHashSig(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_sorted_hashes"),
      new ExpressionInfo(classOf[graft.functions.SortedHashes].getName, "graft_sorted_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SortedHashes(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SortedIntersectCount(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_rademacher"),
      new ExpressionInfo(classOf[graft.functions.RademacherSketch].getName,
        "graft_rademacher"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RademacherSketch(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_rolling_hashes"),
      new ExpressionInfo(classOf[graft.functions.RollingHashes].getName,
        "graft_rolling_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RollingHashes(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_unit"),
      new ExpressionInfo(classOf[graft.functions.UnitVector].getName, "graft_unit"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.UnitVector(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.BoundedTopK].getName, "graft_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BoundedTopK(
          exprs.head.eval().asInstanceOf[Int], exprs(1))))
  }
}

/** Session factory with the engine's tuned defaults: AQE on (runtime
  * shuffle-partition coalescing + skew-join splitting), UTC, and the
  * graft custom expressions registered. At cluster scale the same
  * settings apply — only `master` and the shuffle-partition count
  * (sized ~2-3× total cores) change.
  */
object GraftSession {
  def create(appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    register(spark)
    spark
  }

  /** Register graft's custom Catalyst expressions and required confs
    * in an existing session (idempotent). The nanos conf belongs here
    * so that ANY events read in this session works — not only reads
    * routed through `Tables` (the footgun a bare
    * `spark.read.parquet(events)` otherwise hits).
    */
  def register(spark: SparkSession): Unit = {
    graft.functions.DotProduct.register(spark)
    graft.functions.TokenShingles.register(spark)
    graft.functions.BoundedTopK.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.MinHashSig.register(spark)
    graft.functions.SortedHashes.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    graft.functions.RademacherSketch.register(spark)
    graft.functions.RollingHashes.register(spark)
    graft.functions.UnitVector.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
