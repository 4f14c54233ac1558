package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on the purchase graph (SURVEY.md §2 E):
  * PageRank over the bipartite customer↔supplier graph induced by
  * lineitem (edge ⇔ the customer ordered a part from the supplier).
  * Complements `dedup_clusters` (connected components) as the second
  * fixed-point graph operator.
  *
  * Scale shape: the edge list is built once (distinct pairs off a
  * single orders⋈lineitem pass) and cached; each of the 5 iterations
  * is one edges⋈ranks equi-join + one groupBy(dst) sum — partitioned
  * by node key throughout, nothing on the driver, no per-iteration
  * growth. 5 fixed iterations (not convergence-tested) keeps the plan
  * statically known and the oracle expressible as unrolled CTEs.
  *
  * Determinism: ranks live on an integer grid (SCALE = 10^12).
  * Per-node contribution is integer floor-division by out-degree;
  * the damping step `floor(0.85·x)` and teleport `floor(0.15·SCALE/N)`
  * are correctly-rounded double ops on integers < 2^53 followed by
  * floor — bit-identical across engines and summation orders, so the
  * whole fixed point is value-checked in DuckDB (5 unrolled CTE
  * iterations).
  */
object Graph {

  private val Scale = 1000000000000L // 10^12 rank grid
  private val Iters = 5
  private val TopK = 20

  /** Above this many nodes the per-iteration rank-state broadcast
    * (O(nodes) bytes to every executor, every round) stops being an
    * optimization: the loop switches to the co-partitioned join, where
    * the cached edge list keeps its hash(src) layout across all
    * iterations and only the (node, rank) state — the small side —
    * shuffles each round.
    */
  private[graft] val BroadcastNodeCap = 5000000L

  /** Top-20 PageRank nodes. Node encoding: customer c → 2c,
    * supplier s → 2s+1 (disjoint integer id spaces, no string keys in
    * the shuffle).
    */
  def pagerankTopk(spark: SparkSession, dir: String): DataFrame =
    pagerank(spark, dir, forceCopartition = false)

  /** `forceCopartition` pins the at-scale branch for tests; the
    * default selects by node count (see [[BroadcastNodeCap]]).
    */
  private[graft] def pagerank(spark: SparkSession, dir: String,
      forceCopartition: Boolean): DataFrame = {
    val t = Tables(spark, dir)
    // orders⋈lineitem stays a shuffle join on purpose: at scale BOTH
    // sides are fact-sized (AQE will still broadcast if one side turns
    // out small at runtime)
    val pairs = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    // The loop-invariant out-degree rides ON the edge rows (it only
    // ever divides the source's rank), so the iterating state is just
    // (node, r) and no per-iteration degree join exists at all.
    val raw = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val deg = raw.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // every node has degree ≥ 1 and appears on both edge sides
    // (symmetric closure), so there are no dangling nodes to handle.
    // N is ONE scalar pulled once for the teleport constant (like the
    // dedupClusters converged flag — no graph data crosses the driver);
    // math.floor on doubles = the oracle's floor(CAST ... AS DOUBLE).
    val n = deg.count()
    val copartition = forceCopartition || n > BroadcastNodeCap
    val edgesFlat = raw
      .join(deg.toDF("src", "deg_src"), "src")
      .select(col("src"), col("dst"), col("deg_src"))
    // co-partitioned branch: bake hash(src) partitioning INTO the
    // cached edges once — InMemoryRelation preserves the child's
    // outputPartitioning, so every iteration's src=node join reuses it
    // and only the rank state shuffles
    val edges = (if (copartition) edgesFlat.repartition(col("src")) else edgesFlat)
      .cache()
    val teleport = math.floor(0.15 * Scale.toDouble / n.toDouble).toLong
    var state = deg.select(col("node"), lit(Scale / n).as("r")).cache()
    for (_ <- 1 to Iters) {
      // small graphs: rank state (one row per node) is ≪ the edge
      // list — broadcast it so each iteration streams the cached edges
      // map-side with ONE shuffle (the partial-aggregated contribution
      // groupBy). Large graphs: plain join against the pre-partitioned
      // edges (state shuffles, edges don't). Both branches take an
      // explicit count() barrier: it stops the loop fusing into one
      // deep DAG that Catalyst re-optimizes end to end, fully
      // materializes the round's cache, and thereby lets the PREVIOUS
      // round's frame be released immediately — executor storage holds
      // O(1) rank frames however many iterations run.
      val stateSide = if (copartition) state else broadcast(state)
      val next = edges
        .join(stateSide, edges("src") === state("node"))
        .select(col("dst"), expr("r div deg_src").as("cm"))
        .groupBy(col("dst"))
        .agg(sum(col("cm")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(teleport) +
            expr("CAST(floor(CAST(0.85 AS DOUBLE) * CAST(contrib AS DOUBLE)) AS BIGINT)")).as("r"))
        .cache()
      next.count()
      state.unpersist()
      state = next
    }
    // the final rank state is materialized — the edge cache can go too
    edges.unpersist()
    state.select(col("node"), col("r").as("rank_q12"))
      .orderBy(col("rank_q12").desc, col("node"))
      .limit(TopK)
  }

  val pagerankTopkSql: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (SELECT e.dst AS node,
         |    CAST(floor(CAST(0.15 AS DOUBLE) * CAST($Scale AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE)) AS BIGINT)
         |      + CAST(floor(CAST(0.85 AS DOUBLE) * CAST(sum($prev.r // deg.deg) AS DOUBLE)) AS BIGINT) AS r
         |  FROM edges e JOIN $prev ON $prev.node = e.src JOIN deg ON deg.node = e.src
         |  GROUP BY e.dst)""".stripMargin
    val iters = (1 to Iters).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs),
       |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT node, $Scale // (SELECT n FROM nn) AS r FROM deg),
       |$iters
       |SELECT node, r AS rank_q12 FROM r$Iters ORDER BY r DESC, node LIMIT $TopK""".stripMargin
  }
}
