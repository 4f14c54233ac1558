package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.cosineSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2 G):
  * exact brute-force top-k as the correctness baseline, a
  * random-hyperplane LSH bucketed variant as the scale path, and
  * cosine near-dup pair detection.
  *
  * The dot products run through `zip_with`/`aggregate` higher-order
  * functions — codegen'd, no UDF, array stays columnar.
  */
object Ann {

  private val K = 5
  private val NumQueries = 10
  // private[graft]: VectorIngestSink screens at the SAME τ — a literal
  // copy there could silently drift from the batch family (ADVICE-style
  // review finding, round 15)
  private[graft] val DupThreshold = 0.4

  /** Exact cosine top-k: the query set (vec_id < 10) is broadcast
    * against all candidates, so the scan side streams map-only; ranks
    * are deterministic (sim desc, id asc). Outputs ids+rank only —
    * float scores are engine-noise-sensitive, ranks are not (min
    * adjacent-rank gap in this data ≫ fp noise).
    */
  def annTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val q = withUnit(e, "query_id", "q_emb").filter(col("query_id") < NumQueries)
    val c = withUnit(e, "neighbor_id", "c_emb")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", unitDot(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val annTopkBruteforceSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
       |s AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |         list_cosine_similarity(q.q_emb, c.embedding) AS sim
       |  FROM q, embeddings c WHERE q.query_id != c.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Metadata-FILTERED vector search: exact cosine top-k restricted to
    * candidates sharing the query's label — the "vector search with a
    * WHERE clause" every retrieval pipeline needs (tenant / language /
    * source filters). The predicate is part of the JOIN condition, so
    * it prunes candidates BEFORE any similarity is computed (filter
    *-then-score, never score-then-filter) and the scan side still
    * streams map-only against the broadcast query set. At corpus
    * scale the same predicate composes with the IVF path: probe cells
    * as usual, apply the label equality in the probe join. Filtering
    * only removes candidates, so the brute-force rank-gap argument
    * (sim gaps ≫ fp noise) carries over unchanged.
    */
  def annFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    graft.functions.UnitVector.register(spark)
    val e = Tables(spark, dir).embeddings
    val unit = call_function("graft_unit", col("embedding"))
    val q = e.select(col("vec_id").as("query_id"), col("label").as("q_label"),
      unit.as("q_emb")).filter(col("query_id") < NumQueries)
    val c = e.select(col("vec_id").as("neighbor_id"), col("label").as("c_label"),
      unit.as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("q_label") === col("c_label"))
      .withColumn("sim", unitDot(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("q_label").as("label"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val annFilteredTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |s AS (
       |  SELECT q.query_id, q.label, c.vec_id AS neighbor_id,
       |         list_cosine_similarity(q.q_emb, c.embedding) AS sim
       |  FROM q JOIN embeddings c ON q.query_id != c.vec_id AND q.label = c.label),
       |r AS (SELECT query_id, label, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM s)
       |SELECT query_id, label, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** L2-normalize the embedding once per row (map-side), so every
    * subsequent pair similarity is a bare dot product — at n² pair
    * volume this cuts the inner-loop flops 3× vs recomputing both
    * norms per pair.
    */
  private def withUnit(e: DataFrame, idAs: String, unitAs: String): DataFrame = {
    graft.functions.UnitVector.register(e.sparkSession)
    e.select(col("vec_id").as(idAs),
      call_function("graft_unit", col("embedding")).as(unitAs))
  }

  /** Dot product of two unit vectors (= cosine), index-ordered sum —
    * runs through the codegen'd DotProduct expression (a tight
    * primitive loop), not interpreted higher-order lambdas.
    */
  private def unitDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  /** Micro-unit quantized vector (⌊v·10⁶⌋ per dim, as doubles) + its
    * L2 norm. Cosine over these is BIT-DETERMINISTIC across engines:
    * the dot and the squared norms are exact integers < 2^53 in double
    * arithmetic, and sqrt / multiply / divide are correctly-rounded
    * IEEE ops — so `dot/(na*nb)` is the same 64 bits in Spark and
    * DuckDB regardless of summation order. The LSH/IVF re-rank uses
    * this so its ranking carries no adjacent-sim-gap assumption
    * (unlike brute-force, which ranks true float cosines and documents
    * the gap).
    */
  private def withQ6Norm(e: DataFrame, idAs: String, qAs: String, nAs: String): DataFrame =
    e.select(col("vec_id").as(idAs),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6)).cast("double")).as(qAs))
      .withColumn(nAs, sqrt(call_function("graft_dot", col(qAs), col(qAs))))

  /** Corpus cap for the EXACT all-pairs cosine scan: below it the n²
    * inequality self-join is a bounded 4M-pair broadcast loop (the
    * oracle-checkable ground truth, ~1-3 s worst case); above it the
    * pair volume is physically infeasible (10⁶ vectors = 5·10¹¹
    * pairs) and the near-dup queries route through the cell-bounded
    * candidate scan ([[cellNearDupPairs]]) — measured ~55× wall at
    * 10× vectors on the exact path (SCALE_PROBE_r14) vs ≈linear on
    * the routed one. The driver's oracle gate (sf0.01, 500 vectors)
    * and the sf0.1 bench (2000) sit below the cap, so the routed
    * branch changes values only where the exact branch could not run
    * at all — and its pair set is recall-audited against the exact
    * one at test scale (`embedding_neardup_recall`).
    */
  private[graft] val EmbExactCap = 2048L

  // routing-count memo: THREE registered queries route through
  // dedupEmbeddingCosine, and an unmemoized count() is a full table
  // scan per call purely to pick a branch (review finding, round 15).
  // Keyed like SharedFrames (session identity × dir) AND invalidated
  // with it (ADVICE r15): a table rewritten or grown within one
  // session would otherwise keep routing on the stale count — any
  // SharedFrames.reset()/releaseSession() drops the memo too, and
  // long-lived ingest processes already make those calls.
  private val embCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  graft.core.SharedFrames.onEvict {
    case None    => embCountMemo.clear()
    case Some(s) =>
      val suffix = s"@${System.identityHashCode(s)}"
      embCountMemo.keySet.removeIf(_.endsWith(suffix))
  }

  private def embCorpusCount(spark: SparkSession, dir: String): Long =
    embCountMemo.computeIfAbsent(
      s"$dir@${System.identityHashCode(spark)}",
      _ => Tables.rowCount(spark, dir, "embeddings")).longValue()

  /** Which branch the corpus-cap routing takes at `dir` — (corpus
    * size, cap, "exact" | "routed"). The registered exact-n² oracle
    * SQL is only the ground truth on the exact branch; the verify
    * harness dumps this so a >cap corpus (where the routed pair set
    * is the intended, recall-audited answer and a hash mismatch
    * against the n² oracle is EXPECTED) is loudly visible instead of
    * a silent semantics change (ADVICE r15).
    */
  private[graft] def embRouteAudit(spark: SparkSession, dir: String): (Long, Long, String) = {
    val n = embCorpusCount(spark, dir)
    (n, EmbExactCap, if (n > EmbExactCap) "routed" else "exact")
  }

  /** Embedding near-dup pairs: cosine ≥ τ over all id-ordered pairs.
    * Layout-selected by corpus size (round 15, VERDICT r14 #1): up to
    * [[EmbExactCap]] vectors the EXACT all-pairs scan runs (the
    * oracle-checkable ground truth); above it the pair join would be
    * the registry's one O(n²) plan, so candidates come from the
    * multi-probe k-means cells ([[cellNearDupPairs]]) with an exact
    * per-candidate cosine verify — the SemDeDup-style 100 TB route,
    * recall-audited by `embedding_neardup_recall`. `forceScale` pins
    * the routed branch for tests.
    */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingCosine(spark, dir, forceScale = false)

  private[graft] def dedupEmbeddingCosine(spark: SparkSession, dir: String,
      forceScale: Boolean): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    if (forceScale || embCorpusCount(spark, dir) > EmbExactCap)
      return cellNearDupPairs(spark, dir)
        .select(col("vec_a"), col("vec_b"))
        .orderBy("vec_a", "vec_b")
    val a = withUnit(e, "vec_a", "ua")
    val b = withUnit(e, "vec_b", "ub")
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(unitDot(col("ua"), col("ub")) >= DupThreshold)
      .select(col("vec_a"), col("vec_b"))
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingCosineSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Connected components over the embedding near-dup pair graph —
    * semantic duplicate GROUPS, not just pairs (two paraphrases both
    * near a third are one cluster even when not near each other).
    * Reuses the layout-selected min-label propagation from the text
    * dedup suite ([[Dedup.labelPropagate]]): same O(diameter) rounds,
    * same O(1) cached frames, same broadcast-vs-partitioned selection
    * by pair count. Oracled via a recursive-CTE transitive closure
    * over the identical cosine pair set. The pair build inherits
    * [[dedupEmbeddingCosine]]'s corpus-cap routing (round 15): above
    * [[EmbExactCap]] vectors the clusters form over the cell-bounded
    * recall-audited pair set instead of the infeasible exact n² one.
    */
  def embeddingDedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.labelPropagate(dedupEmbeddingCosine(spark, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")

  val embeddingDedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold),
       |edges AS (SELECT va AS a, vb AS b FROM pairs
       |          UNION SELECT vb, va FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
       |  UNION
       |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n)
       |SELECT n AS vec_id, min(m) AS cluster_id FROM reach GROUP BY n
       |ORDER BY vec_id""".stripMargin

  // 8 tables × 4 planes: tuned for weakly-similar data (top cosine
  // ~0.5 here) — collision prob per table (1-θ/π)^4 ≈ 0.13, miss^8 ≈
  // 0.33 → measured recall@5 = 0.8 at a fraction of the brute-force
  // candidate volume. Stronger near-dup data (the usual dedup case)
  // gets far higher recall at the same setting.

  /** Per-label embedding centroids — elementwise mean via
    * posexplode → (label, dim) partial aggregation. This is the IVF
    * coarse-quantizer build step (centroids then bucket vectors for
    * ANN). The mean is computed over micro-unit quantized values
    * (⌊v·10⁶⌋ as BIGINT): integer partial sums are exactly
    * order-independent, so the result is bit-stable under any
    * 1000-executor reduction order AND reproducible in the DuckDB
    * oracle — a float mean is neither. One scalar row per
    * (label, dim), no arrays in the output (array cells break the
    * driver's pandas-level compare).
    */
  def embeddingCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(floor(col("v").cast("double") * lit(1e6))).cast("double") /
          count(lit(1))).as("centroid_q6"))
      .orderBy("label", "dim")

  val embeddingCentroidsSql: String =
    """WITH ex AS (
      |  SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings)
      |SELECT label, dim, count(*) AS n_vectors,
      |  CAST(CAST(sum(CAST(floor(v * 1e6) AS BIGINT)) AS DOUBLE) / count(*) AS DOUBLE) AS centroid_q6
      |FROM ex GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // -------------------------------------------------------- cluster_purity

  /** Cluster purity of the k-means assignment against the label
    * column: per cell, the majority label's share (tie → smaller
    * label) — the standard external clustering-quality readout (a
    * pure cell means the unsupervised structure recovers the labels;
    * SemDeDup trusts exactly that). Integer voting + ONE divide;
    * rides the session-shared Lloyd's assignment, and the oracle
    * nests the full unrolled k-means SQL as a CTE.
    *
    * Scale shape: the assignment is the heavy part (see
    * `embedding_kmeans`); purity itself is a (cell, label) count over
    * n rows then a ≤k rollup.
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, _, _, _) = kmeansAssign(spark, dir)
    val labels = Tables(spark, dir).embeddings.select(col("vec_id"), col("label"))
    val counts = assigned.join(labels, "vec_id")
      .groupBy(col("cl"), col("label"))
      .agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy("cl")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cl").orderBy(col("c").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cl").as("cluster_id"), col("n").as("n_vectors"),
        col("label").as("majority_label"), col("c").as("majority_count"),
        expr("CAST(c AS DOUBLE) / CAST(n AS DOUBLE)").as("purity"))
      .orderBy("cluster_id")
  }

  lazy val clusterPuritySql: String =
    s"""WITH asg AS ($embeddingKmeansSql),
      |j AS (
      |  SELECT a.cluster_id AS cl, e.label
      |  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id),
      |counts AS (SELECT cl, label, count(*) AS c FROM j GROUP BY 1, 2),
      |r AS (
      |  SELECT *, sum(c) OVER (PARTITION BY cl) AS n,
      |    row_number() OVER (PARTITION BY cl ORDER BY c DESC, label) AS rn
      |  FROM counts)
      |SELECT cl AS cluster_id, CAST(n AS BIGINT) AS n_vectors,
      |  label AS majority_label, CAST(c AS BIGINT) AS majority_count,
      |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS purity
      |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  // --------------------------------------------------------- knn_classify

  /** k-NN classification over the brute-force neighbor lists: each
    * query vector takes the MAJORITY label of its top-k cosine
    * neighbors (tie → smaller label, deterministic), reported beside
    * the query's actual label — the eval loop for "are these
    * embeddings linearly separable enough to trust" (label
    * consistency of the neighborhood is also SemDeDup's sanity
    * check). Pure integer voting on top of the existing retriever —
    * the oracle nests `ann_topk_bruteforce`'s text as a CTE.
    *
    * Scale shape: inherits the retriever's (LSH/IVF at 100 TB); the
    * vote is a (query, label) count over k·queries rows.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings.select(col("vec_id"), col("label"))
    val votes = annTopkBruteforce(spark, dir)
      .join(e.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .groupBy(col("query_id"), col("nl"))
      .agg(count(lit(1)).as("votes"))
    val best = votes
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("nl"))))
      .filter(col("rn") === 1)
    best.join(e.select(col("vec_id").as("query_id"), col("label").as("actual")), "query_id")
      .select(col("query_id"), col("actual").as("actual_label"),
        col("nl").as("predicted_label"), col("votes"),
        when(col("nl") === col("actual"), 1L).otherwise(0L).as("correct"))
      .orderBy("query_id")
  }

  lazy val knnClassifySql: String =
    s"""WITH nn AS ($annTopkBruteforceSql),
      |votes AS (
      |  SELECT nn.query_id, e.label AS nl, count(*) AS votes
      |  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY votes DESC, nl) AS rn
      |  FROM votes)
      |SELECT b.query_id, q.label AS actual_label, b.nl AS predicted_label,
      |  CAST(b.votes AS BIGINT) AS votes,
      |  CAST(CASE WHEN b.nl = q.label THEN 1 ELSE 0 END AS BIGINT) AS correct
      |FROM best b JOIN embeddings q ON q.vec_id = b.query_id
      |WHERE b.rn = 1 ORDER BY b.query_id""".stripMargin

  // ---------------------------------------------------- hybrid_rank_fusion

  private val RrfK = 60 // the standard RRF dampening constant

  /** Reciprocal-rank fusion of two retrievers — exact brute-force
    * cosine and the multi-table LSH path — the ensemble trick hybrid
    * search stacks use (Cormack et al.: Σ 1/(k+rank) is rank-scale
    * free, so heterogeneous retrievers fuse without score
    * calibration). Exactly TWO coalesced terms add per candidate —
    * a fixed-order two-operand IEEE sum, engine-stable (never a
    * variable-order float aggregation). Composes the two operators'
    * own plans/oracles verbatim (the oracle nests both SQL texts as
    * CTEs).
    *
    * Scale shape: inherits both retrievers' scale paths (LSH is the
    * 100-TB candidate generator; brute-force the small-corpus
    * re-ranker); the fusion itself is a (query, neighbor)-keyed outer
    * join over two k-bounded lists — O(queries·k).
    */
  def hybridRankFusion(spark: SparkSession, dir: String): DataFrame = {
    val dense = annTopkBruteforce(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("r_exact"))
    val lsh = annLshTopk(spark, dir)
      .select(col("query_id").as("ql"), col("neighbor_id").as("nl"),
        col("rank").as("r_lsh"))
    dense.join(lsh,
        col("query_id") === col("ql") && col("neighbor_id") === col("nl"), "full")
      .select(
        coalesce(col("query_id"), col("ql")).as("query_id"),
        coalesce(col("neighbor_id"), col("nl")).as("neighbor_id"),
        col("r_exact"), col("r_lsh"),
        expr(s"coalesce(1.0 / CAST($RrfK + r_exact AS DOUBLE), 0.0)" +
          s" + coalesce(1.0 / CAST($RrfK + r_lsh AS DOUBLE), 0.0)").as("rrf"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("neighbor_id"))))
      .filter(col("fused_rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("r_exact"), col("r_lsh"),
        col("rrf"), col("fused_rank"))
      .orderBy("query_id", "fused_rank")
  }

  // lazy: interpolates annLshTopkSql, which is declared LATER in this
  // object — an eager val would capture null at init order
  lazy val hybridRankFusionSql: String =
    s"""WITH dense AS ($annTopkBruteforceSql),
      |lshr AS ($annLshTopkSql),
      |j AS (
      |  SELECT coalesce(d.query_id, l.query_id) AS query_id,
      |    coalesce(d.neighbor_id, l.neighbor_id) AS neighbor_id,
      |    d.rank AS r_exact, l.rank AS r_lsh,
      |    coalesce(1.0 / CAST($RrfK + d.rank AS DOUBLE), 0.0)
      |      + coalesce(1.0 / CAST($RrfK + l.rank AS DOUBLE), 0.0) AS rrf
      |  FROM dense d FULL OUTER JOIN lshr l
      |    ON d.query_id = l.query_id AND d.neighbor_id = l.neighbor_id),
      |f AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf DESC, neighbor_id) AS fused_rank
      |  FROM j)
      |SELECT query_id, neighbor_id, CAST(r_exact AS INTEGER) AS r_exact,
      |  CAST(r_lsh AS INTEGER) AS r_lsh, rrf, CAST(fused_rank AS INTEGER) AS fused_rank
      |FROM f WHERE fused_rank <= $K ORDER BY query_id, fused_rank""".stripMargin

  // ----------------------------------------------- embedding_median_centroid

  /** Coordinate-wise MEDIAN centroid per label — the robust
    * alternative to `embedding_centroids`' mean (one poisoned vector
    * moves a mean by ε·outlier, a median by at most one order
    * statistic — the geometric-median-lite a curation pipeline uses
    * against labeling noise). Median per (label, dim) is the explicit
    * (min+max)/2 over the middle order statistics — the
    * `theil_sen_trend` convention, never an engine `median()` —
    * on bit-identical float→double casts.
    *
    * Scale shape: posexplode partial-reduces into (label, dim)
    * groups — 640 groups here, |labels|·dims always; per-group
    * windows run on grouped frames bounded by vectors-per-label.
    * At 100 TB: replace exact order statistics with a per-group GK
    * sketch (the quantile_profile scale path), same grouping.
    */
  def embeddingMedianCentroid(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables(spark, dir).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "vf")))
      .select(col("label"), col("dim"), col("vf").cast("double").as("v"))
    val w = Window.partitionBy("label", "dim").orderBy("v")
    ex.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("label", "dim")))
      .filter(expr("rn >= CAST(floor((n + 1) / 2.0) AS BIGINT) AND rn <= CAST(floor(n / 2.0) AS BIGINT) + 1"))
      .groupBy(col("label"), col("dim"))
      .agg(max(col("n")).as("n_vectors"),
        expr("(min(v) + max(v)) / 2.0").as("median_coord"))
      .orderBy("label", "dim")
  }

  val embeddingMedianCentroidSql: String =
    """WITH ex AS (
      |  SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY label, dim ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY label, dim) AS n
      |  FROM ex)
      |SELECT label, dim, CAST(max(n) AS BIGINT) AS n_vectors,
      |  (min(v) + max(v)) / 2.0 AS median_coord
      |FROM r
      |WHERE rn >= CAST(floor((n + 1) / 2.0) AS BIGINT)
      |  AND rn <= CAST(floor(n / 2.0) AS BIGINT) + 1
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  /** Multi-table sign-random-projection LSH ANN: 8 tables × 4-bit
    * bucket signatures from the map-side RademacherSketch expression;
    * a candidate is any vector colliding with the query in ≥1 table;
    * exact cosine re-rank over the candidate union. This is the
    * 100 TB path: candidate generation is an equi-join on
    * (table, bucket), so work is ~n·occupancy instead of n². The
    * integer-quantized sketch is bit-reproducible in SQL, so this
    * query is fully oracled despite being approximate by construction
    * (the oracle re-derives the same buckets); recall vs brute force
    * is additionally unit-tested.
    */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    rerankQ6TopK(spark, dir, lshCandidates(spark, dir))
  }

  /** LSH candidate pairs (query_id, neighbor_id) — the equi-join on
    * (table, bucket), deduped across tables. Shared by `ann_lsh_topk`
    * and the `ann_frontier_eval` cost axis.
    */
  private def lshCandidates(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.RademacherSketch.register(spark)
    val e = Tables(spark, dir).embeddings
    val sig = e.select(col("vec_id"),
      posexplode(call_function("graft_rademacher", col("embedding")))
        .as(Seq("tbl", "bucket")))
    val qsig = sig.filter(col("vec_id") < NumQueries)
      .toDF("query_id", "q_tbl", "q_bucket")
    sig.join(broadcast(qsig),
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct() // union candidates across tables
  }

  /** Shared exact re-rank tail of the candidate-bounding retrievers
    * (LSH / IVF / PQ): quantized-cosine score over the candidate
    * pairs (bit-deterministic, see [[withQ6Norm]]), per-query top-K.
    * Queries broadcast; the corpus side joins on neighbor id.
    */
  private def rerankQ6TopK(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val q6 = withQ6Norm(e, "uid", "u", "nrm")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .join(broadcast(q6.toDF("query_id", "q_emb", "q_n")), "query_id")
      .join(q6.toDF("neighbor_id", "c_emb", "c_n"), "neighbor_id")
      .withColumn("sim", unitDot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val annLshTopkSql: String = {
    import graft.functions.RademacherSketch.{NumTables, PlanesPerTable, Dim}
    s"""WITH q6 AS (SELECT vec_id, list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1e6) AS BIGINT)) AS q FROM embeddings),
       |ex AS (SELECT vec_id, unnest(q) AS qv, generate_subscripts(q, 1) - 1 AS d FROM q6),
       |grid AS (SELECT t, p, d,
       |    CASE WHEN ('0x'||substr(md5(CAST(t AS VARCHAR)||'_'||CAST(p AS VARCHAR)||'_'||CAST(d AS VARCHAR)),1,1))::BIGINT & 1 = 1 THEN 1 ELSE -1 END AS w
       |  FROM (SELECT unnest(range($NumTables)) AS t) a,
       |       (SELECT unnest(range($PlanesPerTable)) AS p) b,
       |       (SELECT unnest(range($Dim)) AS d) c),
       |dots AS (SELECT e.vec_id, g.t, g.p, sum(g.w * e.qv) AS s
       |         FROM ex e JOIN grid g ON g.d = e.d GROUP BY 1, 2, 3),
       |buckets AS (SELECT vec_id, t, sum(CASE WHEN s > 0 THEN (1::BIGINT<<p) ELSE 0 END) AS bucket
       |            FROM dots GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
       |         FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
       |         WHERE qb.vec_id < $NumQueries AND qb.vec_id != cb.vec_id),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |sims AS (SELECT c.query_id, c.neighbor_id,
       |           CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
       |         FROM cand c
       |           JOIN ex a ON a.vec_id = c.query_id
       |           JOIN ex b ON b.vec_id = c.neighbor_id AND b.d = a.d
       |           JOIN nrm na ON na.vec_id = c.query_id
       |           JOIN nrm nb ON nb.vec_id = c.neighbor_id
       |         GROUP BY c.query_id, c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sims)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  private val NProbe = 3

  /** IVF (inverted-file) ANN: coarse-quantize the corpus against the
    * per-label centroids (the `embedding_centroids` build step), then
    * search only the query's `NProbe` nearest cells with an exact
    * cosine re-rank. The 100 TB shape: the centroid table is O(nlist)
    * and broadcast, so cell assignment is map-only over the corpus;
    * the probe join is an equi-join on cell id, so candidate volume is
    * n·nprobe/nlist instead of n² — the same candidate-bounding role
    * LSH plays, with data-adaptive cells instead of random planes.
    * Approximate by construction, yet fully oracled: the quantized
    * coarse quantizer is bit-reproducible in SQL (see the q6 note
    * below), so DuckDB re-derives the identical candidate set; recall
    * vs brute force is additionally unit-tested.
    */
  def annIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    rerankQ6TopK(spark, dir, ivfCandidates(spark, dir, NProbe))
  }

  /** IVF candidate pairs at a given probe width — the cell equi-join
    * after map-side coarse quantization. Shared by `ann_ivf_topk`
    * (nprobe = [[NProbe]]) and the `ann_frontier_eval` nprobe sweep.
    */
  private def ivfCandidates(spark: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    // Micro-unit quantization makes the whole coarse-quantizer exact:
    // q = ⌊v·10⁶⌋ and integer centroid means keep every dot product /
    // norm below 2^53, so the double arithmetic is exact integer math —
    // cell assignment has no float-association noise, is independent
    // of reduction order, and is bit-reproducible in the DuckDB oracle.
    val q6 = transform(col("embedding"),
      v => floor(v.cast("double") * lit(1e6)).cast("double"))
    val ex = e.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("label"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).as("qv"))
    val cent = ex.groupBy(col("label"), col("d"))
      .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).as("cv"))
    val cells = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cv")))),
        s => s.getField("cv").cast("double")).as("c6"))
      .select(col("label").as("cell"), col("c6"))
      .withColumn("cnorm", sqrt(call_function("graft_dot", col("c6"), col("c6"))))
    // nearest-cell ranking is fully map-side: the whole (tiny) cell
    // list rides one broadcast row, and each vector sorts its nlist
    // scores locally — no per-vector window, so nothing resembling an
    // n×nlist shuffle exists at any scale (rank 1 = home cell;
    // queries keep NProbe)
    val cellsRow = cells.agg(collect_list(struct(col("cell"), col("c6"),
      col("cnorm"))).as("cs"))
    // cached: assigned + probes both read it, and ann_frontier_eval's
    // three nprobe arms build this identical frame — the CacheManager
    // plan-matches one materialization across all three (the nprobe
    // slice happens downstream); harness-released
    val scored = graft.core.OwnedCaches.own(e.select(col("vec_id"), q6.as("q6"))
      .join(broadcast(cellsRow))
      .withColumn("ranked_cells", expr(
        "array_sort(transform(cs, s -> struct(-(graft_dot(q6, s.c6) / s.cnorm) AS negscore, s.cell AS cell)))"))
      .cache())
    val assigned = scored.select(col("vec_id").as("neighbor_id"),
      expr("element_at(ranked_cells, 1).cell").as("c_cell"))
    val probes = scored.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"),
        explode(expr(s"slice(ranked_cells, 1, $nprobe)")).as("pc"))
      .select(col("query_id"), col("pc.cell").as("cell"))
    assigned.join(broadcast(probes),
        col("cell") === col("c_cell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
  }

  /** Scalar int8 quantization of the embedding table: per-dimension
    * global [min, max] → 256-level codes + per-vector max
    * reconstruction error — the 4×-compression storage format for
    * embedding corpora (codes ship in scans; raw floats only for
    * re-rank). Two passes: one tiny per-dim min/max aggregate
    * (broadcast back), one map-side encode. Every arithmetic step
    * (scale, code, reconstruction, abs error, max) has fixed operand
    * order, so even the float error column hash-matches the oracle.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val ex = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "vf")))
      .select(col("vec_id"), col("d"), col("vf").cast("double").as("v"))
    val mm = ex.groupBy(col("d"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val scale = (col("hi") - col("lo")) / lit(255.0)
    // a constant dimension (hi = lo) has nothing to encode — code 0,
    // zero error; without the guard both engines would divide by zero
    val code = when(col("hi") === col("lo"), 0)
      .otherwise(least(floor((col("v") - col("lo")) / scale).cast("int"), lit(255)))
    ex.join(broadcast(mm), "d")
      .select(col("vec_id"), col("d"), col("v"), col("lo"), scale.as("scale"),
        code.as("code"))
      .groupBy(col("vec_id"))
      .agg(
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col("d"), col("code")))),
            s => s.getField("code").cast("string")))).as("codes_md5"),
        max(abs(col("v") - (col("lo") + col("code") * col("scale")))).as("max_abs_err"))
      .orderBy("vec_id")
  }

  val embeddingQuantizeSql: String =
    """WITH ex AS (
      |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INTEGER) AS d,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings),
      |mm AS (SELECT d, min(v) AS lo, max(v) AS hi FROM ex GROUP BY d),
      |q AS (
      |  SELECT e.vec_id, e.d, e.v, mm.lo, (mm.hi - mm.lo) / 255.0 AS scale,
      |    CASE WHEN mm.hi = mm.lo THEN 0
      |         ELSE least(CAST(floor((e.v - mm.lo) / ((mm.hi - mm.lo) / 255.0)) AS INTEGER), 255) END AS code
      |  FROM ex e JOIN mm ON mm.d = e.d)
      |SELECT vec_id,
      |  md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY d)) AS codes_md5,
      |  max(abs(v - (lo + code * scale))) AS max_abs_err
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin

  private val NSub = 8 // PQ subspaces over the 64-dim embeddings
  private val Shortlist = 50 // ADC candidates per query fed to the exact re-rank

  /** Product-quantization ANN (the third candidate-bounding family
    * after LSH and IVF): split each vector into `NSub` subvectors,
    * train a per-subspace codebook (here: the per-label integer
    * centroids restricted to the subspace — the same build as
    * `embedding_centroids`), encode the corpus as `NSub` small codes,
    * and answer queries by ADC (asymmetric distance computation): the
    * query precomputes its distance to every codebook entry per
    * subspace, and each corpus vector's approximate distance is just
    * the sum of `NSub` table lookups. The ADC pass shortlists
    * `Shortlist` candidates per query; only those touch raw vectors
    * for the exact re-rank. At 100 TB that IO asymmetry is the point
    * of PQ: the full scan reads 8 small codes per vector instead of
    * 64 floats, and raw vectors are fetched for ~50 rows per query.
    * Encoding here is the explode+groupBy formulation (exact and
    * oracle-mirrorable); the scale path map-sides it against a
    * broadcast codebook exactly like the IVF cell ranking.
    *
    * Everything is micro-unit integer arithmetic (squared distances
    * < 2^53), so codes, distance tables, and the final ranking are
    * bit-reproducible in the DuckDB oracle; recall vs brute force is
    * unit-tested separately.
    */
  def annPqTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    rerankQ6TopK(spark, dir, pqShortlist(spark, dir))
  }

  /** PQ/ADC shortlist pairs (query_id, neighbor_id) — codes +
    * query distance tables + ADC sum, shortlisted per query. Shared
    * by `ann_pq_topk` and the `ann_frontier_eval` cost axis.
    */
  /** Per (vector, subspace, codebook entry) integer squared distance —
    * feeds corpus encoding, the query distance tables, and (via
    * `ann_ivfpq_topk`) the ADC pass over IVF-probed candidates.
    * Cached and owned: every consumer reads it at least twice.
    */
  private def pqDistTables(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val ex = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).cast("long").as("qv"))
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("label"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).as("qv"))
      .groupBy(col("label"), col("d"))
      .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).as("cv"))
    val sd = ex.join(broadcast(cent), "d")
      .groupBy(col("vec_id"), (col("d") / lit(NSub)).cast("int").as("sub"),
        col("label").as("clabel"))
      .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("dist"))
      .cache()
    graft.core.OwnedCaches.own(sd)
    sd
  }

  private def pqShortlist(spark: SparkSession, dir: String): DataFrame = {
    val sd = pqDistTables(spark, dir)
    val wEnc = Window.partitionBy("vec_id", "sub").orderBy(col("dist"), col("clabel"))
    val code = sd.withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("clabel").as("code"))
    val qtab = sd.filter(col("vec_id") < NumQueries)
      .toDF("query_id", "q_sub", "q_clabel", "q_dist")
    val adc = code.join(broadcast(qtab),
        col("q_sub") === col("sub") && col("q_clabel") === col("code") &&
          col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("q_dist")).as("dist"))
    // standard PQ pipeline tail: ADC shortlists `Shortlist` candidates
    // per query (reading only codes), then ONLY those touch raw
    // vectors for the exact (quantized-cosine, bit-deterministic)
    // re-rank — the IO asymmetry that makes PQ the 100 TB scan format
    val wAdc = Window.partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
    adc.withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= Shortlist)
      .select(col("query_id"), col("neighbor_id"))
  }

  val annPqTopkSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |sd AS (
       |  SELECT e.vec_id, e.d // $NSub AS sub, c.label AS clabel,
       |         sum((e.qv - c.cv) * (e.qv - c.cv)) AS dist
       |  FROM ex e JOIN cent c ON c.d = e.d
       |  GROUP BY 1, 2, 3),
       |code AS (
       |  SELECT vec_id, sub, clabel AS code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) AS rn FROM sd)
       |  WHERE rn = 1),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.dist) AS dist
       |  FROM code c JOIN sd q ON q.sub = c.sub AND q.clabel = c.code
       |  WHERE q.vec_id < $NumQueries AND q.vec_id != c.vec_id
       |  GROUP BY 1, 2),
       |sl AS (SELECT query_id, neighbor_id
       |       FROM (SELECT query_id, neighbor_id,
       |               row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS srk
       |             FROM adc)
       |       WHERE srk <= $Shortlist),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |sims AS (SELECT s.query_id, s.neighbor_id,
       |           CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
       |         FROM sl s
       |           JOIN ex a ON a.vec_id = s.query_id
       |           JOIN ex b ON b.vec_id = s.neighbor_id AND b.d = a.d
       |           JOIN nrm na ON na.vec_id = s.query_id
       |           JOIN nrm nb ON nb.vec_id = s.neighbor_id
       |         GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM sims)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  val annIvfTopkSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |cy AS (SELECT label, sqrt(CAST(sum(cv*cv) AS DOUBLE)) AS cnorm FROM cent GROUP BY label),
       |scores AS (
       |  SELECT e.vec_id, c.label AS cell,
       |         CAST(sum(e.qv * c.cv) AS DOUBLE) / any_value(cy.cnorm) AS score
       |  FROM ex e JOIN cent c ON c.d = e.d JOIN cy ON cy.label = c.label
       |  GROUP BY e.vec_id, c.label),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS cell_rank
       |  FROM scores),
       |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE cell_rank = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE cell_rank <= $NProbe AND vec_id < $NumQueries),
       |cand AS (SELECT DISTINCT p.query_id, a.neighbor_id
       |         FROM probes p JOIN assigned a ON a.cell = p.cell WHERE a.neighbor_id != p.query_id),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |sims AS (SELECT c.query_id, c.neighbor_id,
       |           CAST(sum(x.qv * y.qv) AS DOUBLE) / (any_value(nx.nrm) * any_value(ny.nrm)) AS sim
       |         FROM cand c
       |           JOIN ex x ON x.vec_id = c.query_id
       |           JOIN ex y ON y.vec_id = c.neighbor_id AND y.d = x.d
       |           JOIN nrm nx ON nx.vec_id = c.query_id
       |           JOIN nrm ny ON ny.vec_id = c.neighbor_id
       |         GROUP BY c.query_id, c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sims)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  private val KmK = 8 // FLOOR for k, not a pin — see kmKFor
  private val KmIters = 3
  private[graft] val KmTargetCellSize = 1000L

  /** Corpus-scaled cell count (the SmallGraphPairCap /
    * simHashBlockCount layout-selection pattern): k =
    * max(8, ⌈n / targetCellSize⌉), decided by ONE count on the
    * already-persisted corpus. Cells stay ~constant-sized as the
    * corpus grows, so (a) semdedup/knn pair volume Σ cell² stays
    * ∝ n · cellSize, and (b) the knn pair equi-join on `cl` has
    * n/cellSize distinct keys — reduce tasks GROW with the corpus
    * instead of pinning at 8 (VERDICT r8 weak #2). At driver test
    * scale (≤ 8000 vectors) the formula yields exactly 8, so the
    * kmeans/semdedup/knn oracles (whose CTEs bake k = 8) are
    * unchanged.
    */
  private[graft] def kmKFor(n: Long): Int =
    math.max(KmK.toLong, (n + KmTargetCellSize - 1) / KmTargetCellSize).toInt

  /** Lloyd's k-means over the embedding corpus (k corpus-scaled via
    * [[kmKFor]] — 8 at test scale, ⌈n/1000⌉ beyond it — 3 fixed
    * iterations) — the corpus-clustering step a curation pipeline runs
    * for SemDeDup-style semantic grouping, diversity sampling, or IVF
    * codebook training on its own data (unlike [[embeddingCentroids]],
    * which needs labels). Deterministic and fully oracled despite
    * being iterative: vectors live on the micro-unit integer grid
    * (⌊v·10⁶⌋), distances are the exact-integer identity
    * dot(v,v) − 2·dot(v,c) + dot(c,c) (every term < 2^53 → the double
    * is the exact integer on both engines), argmin tie-breaks on
    * cluster id, centroid updates are floor(Σ/ n) on exact sums, init
    * is the k lowest-id vectors, and the iteration count is FIXED so
    * the oracle is three unrolled CTE stages (the pagerank recipe).
    * Empty clusters keep their previous centroid (mirrored in SQL).
    *
    * Scale shape: the quantized corpus is cached once
    * (MEMORY_AND_DISK — the standard iterative-input contract) and
    * read iters+1 times; each iteration is one map-side assignment
    * against the k×dims BROADCAST centroid table (argmin as a
    * partial-aggregating min-of-struct, no per-vector window) plus
    * one (cluster, dim)-keyed partial aggregation for the update —
    * nothing driver-side, no shuffle of raw vectors beyond the
    * posexplode sums. 2^53 caveat: a per-(cluster, dim) sum stays
    * exact below ~10⁹ vectors per cluster at q6 magnitude; shard the
    * sum (two-level, like rfm's prefix ranks) past that.
    */
  def embeddingKmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(spark, dir)._1
      .select(col("vec_id"), col("cl").as("cluster_id"),
        col("dist2").cast("double").as("dist2"))
      .orderBy("vec_id")

  /** The Lloyd's iteration behind [[embeddingKmeans]] (and
    * [[semdedupPrune]]/[[knnGraph]]'s clustering stage): returns the
    * final (vec_id, cl, dist2) assignment, the persisted micro-unit
    * quantized corpus it ran over, and the final centroid table (for
    * multi-cell probing).
    */
  /** The queries that read the shared quantized corpus / final
    * Lloyd's assignment (directly or via [[knnGraph]]).
    */
  private[graft] val KmeansConsumers: Set[String] = Set(
    "cluster_purity", "embedding_kmeans", "semdedup_prune",
    "knn_graph", "knn_confusion",
    // round 15: the cell-bounded near-dup family (dedup_embedding_
    // cosine/clusters reach the assignment only on their above-cap
    // scale branch, but a planned run must not release the frames
    // before they might)
    "dedup_embedding_lsh", "dedup_embedding_incremental",
    "embedding_neardup_recall", "dedup_embedding_cosine",
    "dedup_embedding_clusters", "embedding_keep_canonical",
    // round 16: the two-level route's level 1 runs through kmeansAssign
    "ann_twolevel_recall", "twolevel_cell_occupancy",
    // round 17: forced-k audit faces of the same route
    "twolevel_ring_contribution", "ann_adaptive_nprobe",
    // riders of the shared kNN graph (its build reads these frames)
    "embedding_hubness_audit", "knn_reciprocal_rate",
    // round 18: the nprobe tuning curve ranks the same centroids
    "ann_probe_width_curve")

  /** The session-shared micro-unit quantized corpus and its count —
    * the input every kmeans-family build reads. Deliberately
    * SESSION-SHARED, not OwnedCaches-owned (the dedup shingle-set
    * rule): five oracled queries reuse this same quantized corpus —
    * owning it made each rebuild the corpus, +5 s across the family
    * in the round-9 bench. Since round 13 the sharing goes through
    * SharedFrames (released after the family's last planned
    * consumer). MEMORY_AND_DISK and corpus-bounded.
    */
  private[graft] def quantizedCorpus(spark: SparkSession, dir: String): (DataFrame, Long) = {
    graft.functions.DotProduct.register(spark)
    val q = graft.core.SharedFrames.get(spark, "ann.kmeans.q", dir, KmeansConsumers) {
      Tables(spark, dir).embeddings
        .select(col("vec_id"),
          transform(col("embedding"),
            v => floor(v.cast("double") * lit(1e6)).cast("double")).as("qv"))
    }
    (q, q.count()) // O(1) result; materializes the persisted corpus
  }

  private[graft] def kmeansAssign(spark: SparkSession, dir: String,
      kOverride: Option[Int] = None): (DataFrame, DataFrame, DataFrame, Long) = {
    val (q, nVec) = quantizedCorpus(spark, dir)
    val k = kOverride.getOrElse(kmKFor(nVec))
    val wInit = Window.orderBy("vec_id") // k-row frame: single task by construction
    var centroids = q.orderBy("vec_id").limit(k)
      .select((row_number().over(wInit) - 1).cast("long").as("cl"), col("qv").as("cv"))
    val ex = q.select(col("vec_id"), posexplode(col("qv")).as(Seq("dim", "v")))
    var assigned: DataFrame = null
    for (i <- 1 to KmIters) {
      val dist2 = call_function("graft_dot", col("qv"), col("qv")) -
        lit(2.0) * call_function("graft_dot", col("qv"), col("cv")) +
        call_function("graft_dot", col("cv"), col("cv"))
      assigned = q.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("cl"), dist2.as("dist2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist2"), col("cl"))).as("m"))
        .select(col("vec_id"), col("m.cl").as("cl"), col("m.dist2").as("dist2"))
      if (i < KmIters) {
        val sums = assigned.join(ex, "vec_id")
          .groupBy(col("cl"), col("dim"))
          .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("cvd"))
        val rebuilt = sums.groupBy(col("cl"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cvd")))),
            s => s.getField("cvd")).as("cv"))
        val carried = centroids.join(rebuilt.select("cl"), Seq("cl"), "left_anti")
        centroids = rebuilt.unionByName(carried)
      }
    }
    // the FINAL assignment is cached (session-shared like q, n×3
    // rows): every consumer's plan otherwise re-unrolls the whole
    // 3-iteration Lloyd's chain — several times per query where both
    // join sides descend from `assigned`. One memoized frame serves
    // the whole kmeans family; the key carries k because a test
    // kOverride is a DIFFERENT clustering. Values are unchanged:
    // same deterministic plan.
    val plan = assigned
    assigned = graft.core.SharedFrames.get(spark, s"ann.kmeans.assign.k$k", dir,
      KmeansConsumers)(plan)
    // the final centroid table is ALSO memoized (round 15): it is a
    // k-row frame, but as a raw plan it drags the whole unrolled
    // Lloyd's chain into every consumer that broadcasts it — the
    // cell-probe build was re-executing all 3 iterations a second
    // time (~+8 s per isolated 10× query). Same deterministic plan,
    // same values; k in the key for the same reason as the assignment.
    val centPlan = centroids
    val cent = graft.core.SharedFrames.get(spark, s"ann.kmeans.cent.k$k", dir,
      KmeansConsumers)(centPlan)
    (assigned, q, cent, nVec)
  }

  private val SemTau = DupThreshold // cosine cut for semantic duplicates

  /** SemDeDup-style semantic pruning: k-means the embedding corpus,
    * then inside each cluster mark every vector that has a
    * SMALLER-id cluster-mate with cosine ≥ τ as pruned (the greedy
    * keep-first rule of the SemDeDup paper, made deterministic by the
    * id order). Output: every vector with its cluster and keep/prune
    * verdict — the curation decision table.
    *
    * Scale shape: THE reason this exists — the cosine pair join runs
    * WITHIN clusters only, so pair volume is Σ cluster² instead of
    * corpus² (k grows with the corpus: k ≈ n / target-cluster-size
    * keeps per-cluster work constant; the assignment stage is
    * map-only against broadcast centroids either way). Cosines are
    * computed over the same micro-unit integer grid as the clustering
    * (exact-integer dot and norms² < 2^53, then correctly-rounded
    * sqrt/multiply/divide), so every verdict is bit-reproducible in
    * the oracle — which replays the full pipeline: three unrolled
    * Lloyd's CTEs + the within-cluster pair join.
    */
  def semdedupPrune(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, q, _, _) = kmeansAssign(spark, dir)
    val m = assigned.select(col("vec_id"), col("cl"))
      .join(q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv")))),
        "vec_id")
    val l = m.select(col("cl"), col("vec_id").as("va"), col("qv").as("qa"), col("nrm").as("na"))
    val r = m.select(col("cl"), col("vec_id").as("vb"), col("qv").as("qb"), col("nrm").as("nb"))
    // na*nb > 0 gate, mirrored in the oracle: a zero embedding would
    // make the cosine 0/0 — NULL under Spark's non-ANSI Divide
    // (filtered) but NaN in DuckDB (NaN ≥ τ is TRUE there, NaN sorts
    // greatest) — so the convention is explicit: zero-norm vectors
    // participate in no similarity verdicts
    val pruned = l.join(r, Seq("cl"))
      .filter(col("va") < col("vb"))
      .filter(col("na") * col("nb") > 0)
      .filter(call_function("graft_dot", col("qa"), col("qb")) /
        (col("na") * col("nb")) >= SemTau)
      .select(col("vb").as("vec_id")).distinct()
    assigned.join(pruned.withColumn("__p", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl").as("cluster_id"),
        col("__p").isNull.as("is_kept"))
      .orderBy("vec_id")
  }

  private val KnnK = 3
  private[graft] val KnnProbe = 3 // shared with VectorIngestSink (see DupThreshold)
  private val KnnBroadcastCap = 200000L // resident side broadcastable below this

  /** Corpus-scaled probe width for the NEAR-DUP family (round 16,
    * VERDICT r15 #4): a fixed nprobe's recall on a fixed similarity
    * band DECAYS as k grows — cells shrink while the τ-ball does not,
    * so the fraction of a vector's τ-neighborhood inside its 3
    * nearest cells falls (measured at 10×: τ-boundary bucket 0.69
    * with nprobe=3 where the sf0.1 panel read 1.0). Holding
    * band-recall as k grows requires probing a constant FRACTION of
    * cells (nprobe ∝ k — quadratic candidates), so the knob is
    * bounded: nprobe = max(3, min(16, ⌈k/4⌉)). Candidate volume
    * stays nprobe·cellsize·n ≤ 16·1000·n — linear with a capped
    * constant — the floor is MEASURED to hold at 10× and 30×
    * (SCALE_PROBE_r16), and past k = 64 the boundary-bucket decay
    * resumes by design, stated and observable per run
    * (`embedding_neardup_recall` — the recall/cost physics every
    * linear-cost candidate generator obeys; raise the cap when a
    * corpus needs deeper boundary recall and pay its constant).
    * At k = 8 this is exactly [[KnnProbe]], so every oracle text
    * (which bakes nprobe = 3) is untouched on the oracle-gated dirs.
    */
  private[graft] def nprobeFor(k: Int): Int =
    math.max(KnnProbe, math.min(16, (k + 3) / 4))

  /** Corpus-wide kNN GRAPH: every vector's top-3 nearest neighbors —
    * the similarity SELF-join (both sides are the corpus), the
    * primitive under HNSW construction, SemDeDup-style audits, and
    * graph clustering. The per-query ANN family bounds ONE probe
    * side; here the n² cross product is bounded by k-means cells
    * ([[kmeansAssign]], shared with `embedding_kmeans`): every vector
    * PROBES its nprobe=3 nearest cells (rank over the same
    * exact-integer centroid distances) while residing in exactly ONE
    * — pair volume is nprobe × Σ cell², k grows with the corpus, and
    * each (probe, resident) pair arises in exactly one cell, so no
    * dedup join is needed. Recall vs the brute-force graph is
    * unit-tested ≥ 0.5 on this weakly-similar data (nprobe=1 measured
    * 0.31 — same contract as the LSH/IVF/PQ query paths), and cosine on the
    * micro-unit integer grid keeps every edge and rank
    * bit-reproducible — the oracle replays the Lloyd's CTE chain, the
    * probe ranking, and the cell pair ranking.
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame =
    // session-shared: knn_confusion consumes the identical graph —
    // one cell-bounded pair-join materialization serves both queries,
    // released after the later of the two in a planned harness run
    graft.core.SharedFrames.get(spark, "ann.knnGraph", dir,
        Set("knn_graph", "knn_confusion",
          "embedding_hubness_audit", "knn_reciprocal_rate")) {
      knnGraph(spark, dir, kOverride = None, forceShuffle = false)
    }

  /** Test-parameterized face: `kOverride` forces a cell count (the
    * corpus-scaled formula is exercised with a large k at test size),
    * `forceShuffle` pins the above-cap equi-join branch.
    */
  private[graft] def knnGraph(spark: SparkSession, dir: String,
      kOverride: Option[Int], forceShuffle: Boolean): DataFrame = {
    // main face routes through the same layout selector as the
    // near-dup family (round 16): flat ranked cells — identical
    // relation to the inline construction this replaced — on every
    // oracle-gated dir, the O(n·√k) two-level frames above TwoLevelK
    // cells (the kNN graph had the same O(n·k) assignment ceiling);
    // the kOverride test face keeps the explicit flat build
    // the kNN graph ranks TOP-K neighbors, so the ring channel (a
    // pair-level τ-screen, not a per-cell probe) does not compose with
    // its rank window — the graph keeps the probe-cell channel only
    val (assigned, probes, q, nVec) = kOverride match {
      case None =>
        val (a, p, _, qq, n) = nearDupCellFrames(spark, dir)
        (a, p, qq, n)
      case Some(_) =>
        val (a, qq, centroids, n) = kmeansAssign(spark, dir, kOverride)
        val dist2 = call_function("graft_dot", col("qv"), col("qv")) -
          lit(2.0) * call_function("graft_dot", col("qv"), col("cv")) +
          call_function("graft_dot", col("cv"), col("cv"))
        val wProbe = Window.partitionBy(col("va")).orderBy(col("d2"), col("cl"))
        val p = qq.crossJoin(broadcast(centroids))
          .select(col("vec_id").as("va"), col("cl"), dist2.as("d2"))
          .withColumn("rk", row_number().over(wProbe))
          .filter(col("rk") <= KnnProbe)
          .select(col("va"), col("cl"))
        (a.select(col("vec_id"), col("cl")), p, qq, n)
    }
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    val l = probes.join(qn.select(col("vec_id").as("va"),
      col("qv").as("qa"), col("nrm").as("na")), "va")
    val r = assigned.select(col("vec_id").as("vb"), col("cl"))
      .join(qn.select(col("vec_id").as("vb"),
        col("qv").as("qb"), col("nrm").as("nb")), "vb")
    val w = Window.partitionBy(col("va")).orderBy(col("sim").desc, col("vb"))
    // layout selection (the pagerank/dedup_clusters pattern): a
    // shuffle join on `cl` has only k distinct keys — below the cap
    // the resident side broadcasts (vectors × ~350 B — MBs at test
    // scale) and the probe side streams map-only at full parallelism
    // (measured 6.6 s → 2.6 s at sf0.1); above it the equi-join
    // stands, and kmKFor guarantees the corpus-scaled k it needs:
    // cells stay ~KmTargetCellSize-sized, so join keys — and reduce
    // tasks — grow ∝ corpus instead of pinning at 8 (VERDICT r8 #2).
    // Join strategy does not change values: one code path, one hash.
    val paired =
      if (nVec <= KnnBroadcastCap && !forceShuffle) l.join(broadcast(r), Seq("cl"))
      else l.join(r, Seq("cl"))
    paired
      .filter(col("va") =!= col("vb"))
      .filter(col("na") * col("nb") > 0) // zero-norm gate (see semdedupPrune)
      .select(col("va"), col("vb"),
        (call_function("graft_dot", col("qa"), col("qb")) /
          (col("na") * col("nb"))).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("va").as("vec_id"), col("vb").as("neighbor_id"),
        col("rank").cast("int").as("rank"), col("sim"))
      .orderBy("vec_id", "rank")
  }

  val knnGraphSql: String =
    s"""WITH $kmeansCtes,
       |n AS (SELECT vec_id, sqrt(list_dot_product(qv, qv)) AS nrm FROM q),
       |p AS (
       |  SELECT vec_id AS va, cl FROM (
       |    SELECT q.vec_id, c.cl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv), c.cl) AS rk
       |    FROM q CROSS JOIN c${KmIters - 1} c) z WHERE rk <= $KnnProbe),
       |sims AS (
       |  SELECT p.va, y.vec_id AS vb,
       |    list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) AS sim
       |  FROM p JOIN a$KmIters y ON y.cl = p.cl AND y.vec_id != p.va
       |  JOIN q qx ON qx.vec_id = p.va
       |  JOIN q qy ON qy.vec_id = y.vec_id
       |  JOIN n nx ON nx.vec_id = p.va
       |  JOIN n ny ON ny.vec_id = y.vec_id
       |  WHERE nx.nrm * ny.nrm > 0),
       |r AS (SELECT va, vb, sim,
       |        row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) AS rank
       |      FROM sims)
       |SELECT va AS vec_id, vb AS neighbor_id, CAST(rank AS INTEGER) AS rank, sim
       |FROM r WHERE rank <= $KnnK ORDER BY vec_id, rank""".stripMargin

  val semdedupPruneSql: String =
    s"""WITH $kmeansCtes,
       |n AS (SELECT vec_id, sqrt(list_dot_product(qv, qv)) AS nrm FROM q),
       |pr AS (
       |  SELECT DISTINCT y.vec_id AS vb
       |  FROM a$KmIters x JOIN a$KmIters y ON x.cl = y.cl AND x.vec_id < y.vec_id
       |  JOIN q qx ON qx.vec_id = x.vec_id
       |  JOIN q qy ON qy.vec_id = y.vec_id
       |  JOIN n nx ON nx.vec_id = x.vec_id
       |  JOIN n ny ON ny.vec_id = y.vec_id
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $SemTau)
       |SELECT a.vec_id, a.cl AS cluster_id, pr.vb IS NULL AS is_kept
       |FROM a$KmIters a LEFT JOIN pr ON pr.vb = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** The unrolled-Lloyd's CTE chain (q, ex, c0, a1, c1 … a\$KmIters) —
    * shared verbatim by the kmeans oracle and the semdedup oracle, so
    * the two gates can never drift apart. A `def` (not a val): it is
    * referenced by vals declared above it.
    */
  /** The unrolled flat-Lloyd's CTE chain, parametrized (round 16) so
    * the two-level oracle can replay a SECOND chain (level 1 at k₂)
    * over the same q/ex without name collisions: `k` is the init
    * width, `cPfx`/`aPfx` the centroid/assignment CTE prefixes.
    * `withBase = false` omits the shared q/ex CTEs (emit them once).
    */
  private def kmeansCtesFor(k: Int, cPfx: String, aPfx: String,
      withBase: Boolean): String = {
    def assign(cprev: String, aname: String): String =
      s"""$aname AS (
         |  SELECT vec_id, cl, dist2 FROM (
         |    SELECT q.vec_id, c.cl,
         |      list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv) AS dist2,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv), c.cl) AS rk
         |    FROM q CROSS JOIN $cprev c) z WHERE rk = 1)""".stripMargin
    def update(aname: String, cprev: String, cname: String): String =
      s"""${cname}_s AS (
         |  SELECT a.cl, dim, floor(CAST(sum(v) AS DOUBLE) / count(*)) AS cvd
         |  FROM $aname a JOIN ex ON ex.vec_id = a.vec_id GROUP BY a.cl, dim),
         |$cname AS (
         |  SELECT cl, list(cvd ORDER BY dim) AS cv FROM ${cname}_s GROUP BY cl
         |  UNION ALL
         |  SELECT c.cl, c.cv FROM $cprev c WHERE c.cl NOT IN (SELECT cl FROM ${cname}_s))""".stripMargin
    val base = if (!withBase) Nil else Seq(
      """q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1e6) AS DOUBLE) for x in embedding] AS qv
        |  FROM embeddings)""".stripMargin,
      """ex AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INTEGER) AS dim,
        |         floor(CAST(unnest(embedding) AS DOUBLE)*1e6) AS v
        |  FROM embeddings)""".stripMargin)
    val ctes = base ++ Seq(
      s"""${cPfx}0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl, qv AS cv
         |  FROM (SELECT * FROM q ORDER BY vec_id LIMIT $k))""".stripMargin) ++
      (1 to KmIters).flatMap { i =>
        Seq(assign(s"$cPfx${i - 1}", s"$aPfx$i")) ++
          (if (i < KmIters) Seq(update(s"$aPfx$i", s"$cPfx${i - 1}", s"$cPfx$i")) else Nil)
      }
    ctes.mkString(",\n")
  }

  private def kmeansCtes: String = kmeansCtesFor(KmK, "c", "a", withBase = true)

  val embeddingKmeansSql: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, cl AS cluster_id, CAST(dist2 AS DOUBLE) AS dist2
       |FROM a$KmIters ORDER BY vec_id""".stripMargin

  // ------------------------------------------------- dedup_embedding_lsh

  /** The norms + multi-probe + q6-cosine CTE prelude shared verbatim
    * by the three cell-bounded near-dup oracles (`dedup_embedding_lsh`,
    * `embedding_neardup_recall`, `dedup_embedding_incremental`) — one
    * text, so the three gates cannot drift. Probing mirrors
    * [[knnGraph]]: every vector ranks the final centroids by exact
    * integer distance and probes its [[KnnProbe]] nearest cells while
    * residing in exactly one.
    */
  private def cellProbeCtes: String =
    s"""n AS (SELECT vec_id, sqrt(list_dot_product(qv, qv)) AS nrm FROM q),
       |p AS (
       |  SELECT vec_id AS va, cl FROM (
       |    SELECT q.vec_id, c.cl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv), c.cl) AS rk
       |    FROM q CROSS JOIN c${KmIters - 1} c) z WHERE rk <= $KnnProbe)""".stripMargin

  /** The near-dup family queries that read the shared multi-probe
    * frame ([[cellProbes]]).
    */
  private[graft] val CellProbeConsumers: Set[String] = Set(
    "dedup_embedding_lsh", "dedup_embedding_incremental",
    "embedding_neardup_recall", "dedup_embedding_cosine",
    "dedup_embedding_clusters", "embedding_keep_canonical",
    // round 16: the forced-k two-level frames share these keys, and
    // the kNN-graph family now routes through the same layout
    // selector (its inline flat probe build had the same O(n·k)
    // assignment ceiling)
    "ann_twolevel_recall", "twolevel_cell_occupancy",
    // round 17: the ring-channel audit and the adaptive-probe audit
    // replay the same forced-k frames
    "twolevel_ring_contribution", "ann_adaptive_nprobe",
    "knn_graph", "knn_confusion",
    "embedding_hubness_audit", "knn_reciprocal_rate")

  /** Every vector's [[KnnProbe]] nearest cells (va, cl) — the
    * multi-probe relation under the whole cell-bounded near-dup
    * family. SESSION-SHARED and persisted: [[kmeansAssign]] memoizes
    * the corpus and the final ASSIGNMENT but hands back the final
    * centroids as a raw unrolled Lloyd's plan, so an unpersisted
    * probe frame re-executes the whole 3-iteration chain inside every
    * consumer (measured: +4 s per query at sf0.1). n×nprobe narrow
    * rows — corpus-bounded.
    */
  private[graft] def cellProbes(spark: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.get(spark, "ann.cellProbes", dir, CellProbeConsumers) {
      val (_, q, centroids, nVec) = kmeansAssign(spark, dir)
      val dist2 = call_function("graft_dot", col("qv"), col("qv")) -
        lit(2.0) * call_function("graft_dot", col("qv"), col("cv")) +
        call_function("graft_dot", col("cv"), col("cv"))
      val wProbe = Window.partitionBy(col("va")).orderBy(col("d2"), col("cl"))
      q.crossJoin(broadcast(centroids))
        .select(col("vec_id").as("va"), col("cl"), dist2.as("d2"))
        .withColumn("rk", row_number().over(wProbe))
        .filter(col("rk") <= nprobeFor(kmKFor(nVec))) // = KnnProbe at oracle dirs
        .select(col("va"), col("cl"))
    }

  // ------------------------------------------ two-level coarse quantizer

  /** Above this cell count the flat quantizer's n·k assignment/probe
    * ranking routes through the two-level hierarchy instead (VERDICT
    * r15 #3): flat cost per vector is k = ⌈n/1000⌉ distance
    * evaluations — n²/1000 total, invisible at 20 k vectors (k = 20)
    * and fatal at 10⁹ (k = 10⁶ → 10¹⁵ ops) — while the hierarchy
    * pays k₂ + SuperProbe·⌈k/k₂⌉ ≈ (1+SuperProbe)·√k per vector,
    * O(n·√k) total, and its TRAINING is O(n·√k·iters) too (level 1
    * is Lloyd's at k₂; level 2 ranks each vector only against its
    * own super-cell's children). The strict work crossover is
    * k = (1+SuperProbe)² = 25; routing starts at 16 because the
    * k ∈ (16, 25] band is a wash (21·√k vs k within ±25%) while the
    * vector-store asymptote (k = 10⁶ → 200× less assignment work) is
    * the design point — and every oracle-gated dir (sf0.001/0.01/0.1
    * → k = 8) stays BELOW 16, so the flat branch remains the
    * oracle-replayed ground truth and the hierarchy is the measured
    * scale route (the EmbExactCap routing convention, one level up).
    */
  private[graft] val TwoLevelK = 16
  // super-cells probed before child ranking — the hierarchy's own
  // recall/cost knob (each +1 costs ⌈k/k₂⌉ ≈ √k more child ranks per
  // vector): 3 measured 0.797 pair recall on the forced k=20/500-
  // vector worst-case geometry and 0.661 on the 10× replica's
  // 59-pair 0.5-band; 5 holds every 10×/30× bucket at the 0.8 floor
  // (SCALE_PROBE_r16) while the per-vector rank pool stays
  // (1+SuperProbe)·√k ≪ k at vector-store scale
  private[graft] val SuperProbe = 5

  /** Hamming cap of the boundary-ring SRP screen (round 17, VERDICT
    * r16 #2). The r16 knob left τ-boundary recall band-limited: with
    * nprobe capped at 16, bucket-4 recall read 0.626 at 100× vectors
    * (k = 200), and the measured miss attribution (RouteRecall `why`,
    * SCALE_PROBE_r17) showed 56% of those misses sit INSIDE the
    * 64-deep ranked pool (median rank 29) — reachable by deeper
    * probing, but probing 4× more cells exactly would 4× the exact
    * verify volume. The refine: cells ranked (nprobe, ringDepth] join
    * as NARROW rows (vec_id, cell, two 63-bit SRP words — 16 bytes of
    * signature vs the full vector + norm) and a pair survives to the
    * exact cosine verify only if hamming(sig_a, sig_b) ≤ this cap. At
    * τ = 0.4 (θ ≈ 66.4°) the expected hamming distance is
    * 126·θ/π ≈ 46.5 (σ ≈ 5.4), so 54 ≈ +1.4σ passes ~92% of τ-band
    * pairs while rejecting the bulk of near-orthogonal ones (mean 63,
    * P[≤54] ≈ 4%) — the ring's exact-verify volume stays a small
    * fraction of the base channel's instead of 4×. Both the screen
    * and its verdicts are exact integer bit math — replayed verbatim
    * by the forced-k oracles.
    */
  private[graft] val RingHammingCap = 54

  /** The two-level quantizer's (home-cell assignment, multi-probe)
    * frames — the O(n·√k) replacement for [[kmeansAssign]]'s flat
    * argmin plus [[cellProbes]]' flat ranking above [[TwoLevelK]]
    * cells.
    *
    * Construction (all on the micro-unit grid — the exact-integer
    * distance identity keeps every argmin bit-deterministic):
    *   1. level 1: [[kmeansAssign]] at k₂ = ⌈√k⌉ — Lloyd's over the
    *      corpus, n·k₂ per iteration;
    *   2. level 2: ⌈k/k₂⌉ children per super-cell, Lloyd's KEYED on
    *      the super-cell (each vector ranks only its own super's
    *      children — an equi-join on `scl` against the broadcast
    *      k-row child table, never a crossJoin), n·⌈k/k₂⌉ per
    *      iteration; init is each super's ⌈k/k₂⌉ lowest-id members,
    *      empty children carry their previous centroid (the flat
    *      recipe's conventions, group-keyed);
    *   3. home cell: the level-2 argmin within the vector's own
    *      super (the IVF assignment convention);
    *   4. probes: rank the k₂ super-centroids (n·k₂, top
    *      [[SuperProbe]]), then rank ONLY the probed supers' children
    *      (n·SuperProbe·⌈k/k₂⌉, top [[KnnProbe]]).
    *
    * Global cell id: cl = scl·⌈k/k₂⌉ + child — consumers only ever
    * equi-join on it. Recall vs the flat route loses only pairs whose
    * true near-cells hide under an unprobed super; the end-to-end
    * recall audit (`embedding_neardup_recall`) measures exactly that
    * channel at scale, and Round16Spec pins it ≥ 0.8 with the
    * hierarchy FORCED at test size.
    */
  private[graft] def hierCellFrames(spark: SparkSession, dir: String,
      kOpt: Option[Int] = None): (DataFrame, DataFrame, DataFrame) =
    // production route (kOpt = None): occupancy-adaptive probe walk
    // (round 18, VERDICT r17 #5 — `ann_adaptive_nprobe` promoted from
    // audit to the routing decision). The forced-k face keeps the
    // fixed width: it is the ORACLE-REPLAYED geometry (the four
    // twolevel oracles bake the fixed-nprobe CTE), and the audit
    // query stays the walk's own oracle.
    hierCellFrames(spark, dir, kOpt, adaptive = kOpt.isEmpty)

  private[graft] def hierCellFrames(spark: SparkSession, dir: String,
      kOpt: Option[Int], adaptive: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val (q, nVec) = quantizedCorpus(spark, dir)
    val k = kOpt.getOrElse(kmKFor(nVec))
    val k2 = math.ceil(math.sqrt(k.toDouble)).toInt
    val kc = (k + k2 - 1) / k2 // children per super-cell
    val keyTag = s"k$k" // a forced k is a DIFFERENT quantizer (test face)
    def d2(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      call_function("graft_dot", v, v) -
        lit(2.0) * call_function("graft_dot", v, c) +
        call_function("graft_dot", c, c)
    // level 1 — the existing Lloyd's machinery at k₂ (its SharedFrames
    // keys carry k₂, so this never collides with a flat corpus-k build).
    // Materialize (and so pin) the memoized L1 frames EAGERLY: every
    // level-2 frame descends from them, and a lazy chain here stacks
    // the L1 iterations under the L2 ones — the 2^levels analysis/
    // re-execution blowup the skill file warns about, which at 10×
    // presented as >300 s broadcast-thread materializations (the
    // broadcast timeout killed three queries before severance landed)
    val (supAssign, _, supCent, _) = kmeansAssign(spark, dir, Some(k2))
    supCent.count()
    // members with their vectors: the one vec_id-keyed shuffle join of
    // the build; session-shared because the level-2 loop reads it
    // iters·2 times and both returned frames descend from it
    val m = graft.core.SharedFrames.get(spark, s"ann.hier.members.$keyTag", dir,
        CellProbeConsumers) {
      supAssign.select(col("vec_id"), col("cl").as("scl")).join(q, "vec_id")
    }
    m.count()
    // lineage severance per level-2 round (the communityLouvain /
    // betweenness pattern): child_{i} references child_{i-1} three
    // times (assignment join, update carry, anti-join) — unsevered,
    // materialization re-executes the base chain 3^iters times
    def sever(df: DataFrame): DataFrame = {
      val rdd = df.rdd
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      graft.core.OwnedCaches.ownRdd(rdd)
      spark.createDataFrame(rdd, df.schema)
    }
    // level 2 — group-keyed Lloyd's. The WHOLE loop lives inside the
    // memoized child builder (round 18): sever() materializes each
    // round's RDD EAGERLY at plan-construction time, so with the loop
    // at call level every consumer of the (memoized!) output frames
    // was re-paying the 3-round build per CALL — a flat ~5 s/run on
    // every forced-k audit query (the r17 shared pair charged it to
    // all four family members). On a warm session the builder is
    // skipped entirely and a call costs three O(1) count()s on
    // persisted frames.
    val childF = graft.core.SharedFrames.get(spark, s"ann.hier.child.$keyTag", dir,
        CellProbeConsumers) {
      val wIn = Window.partitionBy(col("scl")).orderBy(col("vec_id"))
      var child = sever(m.withColumn("rn", row_number().over(wIn))
        .filter(col("rn") <= kc)
        .select(col("scl"), (col("rn") - 1).cast("long").as("ch"), col("qv").as("cv")))
      val mex = m.select(col("vec_id"), col("scl"),
        posexplode(col("qv")).as(Seq("dim", "v")))
      for (_ <- 1 until KmIters) {
        // assignment against the current children, then the rebuild —
        // the update sequence is identical to the original unrolled
        // loop (asg_i vs child_{i-1} feeds child_i); the FINAL
        // assignment is recomputed once from the final children in
        // the `assign` builder below, which is exactly iteration
        // KmIters of the original loop
        val asgI = m.join(broadcast(child), Seq("scl"))
          .select(col("vec_id"), col("scl"), col("ch"),
            d2(col("qv"), col("cv")).as("d2"))
          .groupBy(col("vec_id"), col("scl"))
          .agg(min(struct(col("d2"), col("ch"))).as("mm"))
          .select(col("vec_id"), col("scl"), col("mm.ch").as("ch"))
        val sums = asgI.join(mex, Seq("vec_id", "scl"))
          .groupBy(col("scl"), col("ch"), col("dim"))
          .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("cvd"))
        val rebuilt = sums.groupBy(col("scl"), col("ch"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cvd")))),
            s => s.getField("cvd")).as("cv"))
        val carried = child.join(rebuilt.select("scl", "ch"), Seq("scl", "ch"), "left_anti")
        child = sever(rebuilt.unionByName(carried))
      }
      child
    }
    // pin the memoized blocks NOW: the severed RDDs backing the plan
    // are OwnedCaches-released after the building query materializes,
    // and an unmaterialized childF would re-execute their full
    // lineage on the next consumer
    childF.count()
    val cellId = (col("scl") * lit(kc.toLong) + col("ch")).as("cl")
    val assign = graft.core.SharedFrames.get(spark, s"ann.hier.assign.$keyTag", dir,
      CellProbeConsumers) {
      m.join(broadcast(childF), Seq("scl"))
        .select(col("vec_id"), col("scl"), col("ch"),
          d2(col("qv"), col("cv")).as("d2"))
        .groupBy(col("vec_id"), col("scl"))
        .agg(min(struct(col("d2"), col("ch"))).as("mm"))
        .select(col("vec_id"),
          (col("scl") * lit(kc.toLong) + col("mm.ch")).as("cl"))
    }
    // the ranked child pool — every (vector, candidate cell) pair the
    // probe stage considers, with its exact integer distance and rank,
    // capped at [[ringDepthFor]] (≥ nprobe). Its own shared frame
    // (round 17): the production probe set AND the adaptive boundary
    // ring both derive from it with cheap filters, and the RouteRecall
    // miss-attribution probe reads it directly.
    val rankedF = graft.core.SharedFrames.get(spark, s"ann.hier.ranked.$keyTag", dir,
      CellProbeConsumers) {
      val wSup = Window.partitionBy(col("va")).orderBy(col("d2"), col("scl"))
      val supProbes = q.crossJoin(broadcast(supCent.select(col("cl").as("scl"),
          col("cv").as("sv"))))
        .select(col("vec_id").as("va"), col("scl"), d2(col("qv"), col("sv")).as("d2"))
        .withColumn("rk", row_number().over(wSup))
        .filter(col("rk") <= SuperProbe)
        .select(col("va"), col("scl"))
      val wCell = Window.partitionBy(col("va")).orderBy(col("d2"), col("cl"))
      supProbes.join(q.select(col("vec_id").as("va"), col("qv")), "va")
        .join(broadcast(childF), Seq("scl"))
        .select(col("va"), cellId, d2(col("qv"), col("cv")).as("d2"))
        .withColumn("rk", row_number().over(wCell))
        .filter(col("rk") <= ringDepthFor(k))
    }
    // the admission walk (adaptive face only): every pool cell tagged
    // with whether the cumulative home-cell mass of the cells ranked
    // BEFORE it stays under 4·⌈n/k⌉ — the `ann_adaptive_nprobe` rule.
    // Skewed layouts stop in fewer, heavier probes; sparse ones walk
    // deeper at the same admitted candidate mass — the trade a fixed
    // nprobe cannot make, and the reason this is the production route.
    // One shared frame because the probe set AND the boundary ring are
    // its two complements (admitted / leftover pool).
    val adaptTag = if (adaptive) s"$keyTag.adp" else keyTag
    lazy val walkF = graft.core.SharedFrames.get(spark,
        s"ann.hier.walk.$keyTag", dir, CellProbeConsumers) {
      // BUDGET-MATCHED target (vs the audit's fixed 4·⌈n/k⌉ probe of
      // the rule): nprobeFor(k) average cells of cumulative mass — the
      // exact expected candidate budget of the fixed width, so on a
      // UNIFORM layout the walk admits the same nprobe cells and the
      // promotion is behavior-neutral; on skew it trades heavy
      // early cells for deeper sparse walks at the same admitted mass
      // (measured 10×: 88.8k probe rows vs fixed 100k at equal
      // recall — see SCALE_PROBE_r18)
      val target = nprobeFor(k).toLong * ((nVec + k - 1) / k)
      val occ = assign.groupBy(col("cl")).agg(count(lit(1)).as("mass"))
      val wBefore = Window.partitionBy("va").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, -1)
      rankedF.join(occ, Seq("cl"), "left")
        .select(col("va"), col("cl"), col("rk"),
          coalesce(col("mass"), lit(0L)).as("mass"))
        .withColumn("adm",
          coalesce(sum(col("mass")).over(wBefore), lit(0L)) < lit(target))
        .select(col("va"), col("cl"), col("adm"))
    }
    val probes = graft.core.SharedFrames.get(spark, s"ann.hier.probes.$adaptTag", dir,
      CellProbeConsumers) {
      // corpus-scaled probe width (the recall knob): the fixed face
      // takes nprobeFor(k); the adaptive face admits by cumulative
      // occupancy. Either way the SuperProbe·⌈k/k₂⌉ ranked pool is
      // ≥ 4√k ≥ nprobe ≤ 16 for every k > TwoLevelK.
      val ranked =
        if (adaptive) walkF.filter(col("adm")).select(col("va"), col("cl"))
        else rankedF.filter(col("rk") <= nprobeFor(k)).select(col("va"), col("cl"))
      // the HOME cell always rides along: in the flat quantizer the
      // rank-1 probe IS the home cell by construction, but here the
      // top-KnnProbe of the combined child ranking can exclude it (a
      // neighboring super's children can all rank closer) — and an
      // in-cell pair neither member probes would be silently lost.
      // ≤ n extra narrow rows, distinct-collapsed.
      ranked.unionByName(assign.select(col("vec_id").as("va"), col("cl")))
        .distinct()
    }
    // the boundary ring's SRP-screened pair channel (round 17): cells
    // ranked (nprobe, ringDepth] carry only 16-byte signatures through
    // the cell equi-join; survivors of the hamming screen go to the
    // exact verify. Persisted SURVIVOR-sized (the screen runs inside
    // the build), shared by the near-dup scan and the incremental
    // admission so the iff-equivalence between them holds by
    // construction.
    val ring = graft.core.SharedFrames.get(spark, s"ann.hier.ring.$adaptTag", dir,
      CellProbeConsumers) {
      val sig = graft.core.SharedFrames.get(spark, "ann.srpsig", dir,
        CellProbeConsumers) {
        graft.functions.Srp126.register(spark)
        q.select(col("vec_id"),
          call_function("graft_srp126", col("qv")).as("sg"))
          .select(col("vec_id"), col("sg").getItem(0).as("s0"),
            col("sg").getItem(1).as("s1"))
      }
      // ring = the pool the probe stage did NOT admit (walk leftover
      // on the adaptive face, rank > nprobe on the fixed face) — the
      // two faces partition the same ranked pool either way
      val l = (if (adaptive) walkF.filter(!col("adm"))
               else rankedF.filter(col("rk") > nprobeFor(k)))
        .select(col("va"), col("cl"))
        .join(sig.select(col("vec_id").as("va"),
          col("s0").as("a0"), col("s1").as("a1")), "va")
      val r = assign.select(col("vec_id").as("vb"), col("cl"))
        .join(sig.select(col("vec_id").as("vb"),
          col("s0").as("b0"), col("s1").as("b1")), "vb")
      val paired =
        if (nVec <= KnnBroadcastCap) l.join(broadcast(r), Seq("cl"))
        else l.join(r, Seq("cl"))
      paired
        .filter(col("va") =!= col("vb"))
        .filter((expr("bit_count(a0 ^ b0)") + expr("bit_count(a1 ^ b1)"))
          <= RingHammingCap)
        .select(col("va"), col("vb"))
    }
    (assign, probes, ring)
  }

  /** Depth of the ranked child pool kept by [[hierCellFrames]] — the
    * candidate-cell horizon for both the base probe width and the
    * adaptive boundary ring (round 17). 4× the base width, bounded by
    * the pool the [[SuperProbe]] supers expose.
    */
  private[graft] def ringDepthFor(k: Int): Int = {
    val k2 = math.ceil(math.sqrt(k.toDouble)).toInt
    val kc = (k + k2 - 1) / k2
    math.min(4 * nprobeFor(k), SuperProbe * kc)
  }

  /** The ranked child pool (va, cl, d2, rk ≤ [[ringDepthFor]]) of the
    * two-level quantizer — dev-probe accessor (RouteRecall's
    * miss-attribution mode reads ranks and distances directly).
    */
  private[graft] def hierRankedPool(spark: SparkSession, dir: String,
      kOpt: Option[Int] = None): DataFrame = {
    val (q, nVec) = quantizedCorpus(spark, dir)
    val k = kOpt.getOrElse(kmKFor(nVec))
    hierCellFrames(spark, dir, kOpt) // ensures the shared frame exists
    graft.core.SharedFrames.get(spark, s"ann.hier.ranked.k$k", dir,
      CellProbeConsumers)(sys.error("ranked pool must already be built"))
  }

  /** Layout router for the cell-bounded near-dup family: the (home
    * assignment, probes, ring pairs, corpus, count) its pair scans
    * consume — flat quantizer (oracle-replayed) up to [[TwoLevelK]]
    * cells (no ring: the flat probe width already spans a constant
    * fraction of its ≤16 cells), two-level hierarchy + SRP-screened
    * boundary ring above it.
    */
  private[graft] def nearDupCellFrames(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, Option[DataFrame], DataFrame, Long) = {
    val (q, nVec) = quantizedCorpus(spark, dir)
    if (kmKFor(nVec) <= TwoLevelK) {
      val (assigned, _, _, _) = kmeansAssign(spark, dir)
      (assigned.select(col("vec_id"), col("cl")), cellProbes(spark, dir), None, q, nVec)
    } else {
      val (assign, probes, ring) = hierCellFrames(spark, dir)
      (assign, probes, Some(ring), q, nVec)
    }
  }

  /** Cell-bounded near-dup pair scan — the 100 TB face of the
    * embedding dedup family (round 15, VERDICT r14 #1): candidates
    * are (probe, resident) pairs inside the SAME k-means cell
    * ([[kmeansAssign]] — k grows with the corpus via [[kmKFor]], so
    * candidate volume is nprobe × n × cell-size, LINEAR in n where
    * the exact scan is n²), each verified with the bit-deterministic
    * micro-unit cosine before any pair is emitted. Multi-probe
    * (nprobe = [[KnnProbe]]) catches the near-boundary pairs a
    * home-cell-only scan (`semdedup_prune`'s shape) structurally
    * misses; recall against the exact pair set is measured by
    * `embedding_neardup_recall` and unit-tested. The probe-side rows
    * carry their vectors through the one cell equi-join (the
    * [[knnGraph]] layout, including its broadcast-below-cap
    * selection), so verification adds NO second join; the verified
    * survivors are canonicalized (vec_a < vec_b) and deduped — sim is
    * bit-symmetric (commutative float dot / product), so the distinct
    * collapses the two in-cell directions exactly.
    */
  private[graft] def cellNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    // SESSION-SHARED: above the corpus cap THREE queries consume this
    // identical verified pair frame (`dedup_embedding_lsh` plus the
    // routed `dedup_embedding_cosine`/`_clusters`) — one cell-bounded
    // scan serves all of them; τ-survivors only, so the persisted
    // frame is near-dup-sized, not candidate-sized
    graft.core.SharedFrames.get(spark, "ann.cellNearDup", dir,
        Set("dedup_embedding_lsh", "dedup_embedding_cosine",
          "dedup_embedding_clusters", "embedding_keep_canonical",
          "embedding_neardup_recall")) {
      // flat (oracle-replayed) quantizer up to TwoLevelK cells, the
      // O(n·√k) two-level hierarchy above — the route's second-stage
      // routing (round 16, VERDICT r15 #3); the verify + canonicalize
      // stages below are branch-independent
      val (assigned, probes, ring, q, nVec) = nearDupCellFrames(spark, dir)
      cellPairScan(assigned, probes, q, nVec, ring)
    }

  /** The branch-independent (probe × resident) pair scan + exact
    * micro-unit cosine verify + canonicalize — shared by both
    * quantizer layouts and by Round16Spec's forced-hierarchy recall
    * pin. `ring` (routed branch only) adds the SRP-screened boundary
    * pairs as a SECOND verified channel: the survivors fetch their
    * vectors by vec_id (survivor-sized joins, not ring-sized), pass
    * the identical exact-cosine gate, and the canonical distinct
    * collapses cross-channel duplicates exactly (same inputs ⇒ same
    * bit-identical sim on both channels).
    */
  private[graft] def cellPairScan(assigned: DataFrame, probes: DataFrame,
      q: DataFrame, nVec: Long, ring: Option[DataFrame] = None): DataFrame = {
    val base = cellBaseVerified(assigned, probes, q, nVec)
    (ring match {
      case None => base
      case Some(rp) => base.unionByName(ringVerified(rp, q, nVec))
    }).distinct()
  }

  /** Exact micro-unit-cosine verify + canonicalize, shared by both
    * candidate channels. NOT deduped — callers distinct() after the
    * channel union so cross-channel duplicates collapse exactly
    * (same inputs ⇒ same bit-identical sim on both channels).
    */
  private def pairVerify(cand: DataFrame): DataFrame = cand
    .filter(col("va") =!= col("vb"))
    .filter(col("na") * col("nb") > 0) // zero-norm gate (see semdedupPrune)
    .withColumn("sim", call_function("graft_dot", col("qa"), col("qb")) /
      (col("na") * col("nb")))
    .filter(col("sim") >= DupThreshold)
    .select(least(col("va"), col("vb")).as("vec_a"),
      greatest(col("va"), col("vb")).as("vec_b"), col("sim"))

  /** BASE channel: the nprobe-wide (probe × resident) cell equi-join,
    * verified. Factored out of [[cellPairScan]] (VERDICT r17 #1) so
    * `twolevel_ring_contribution` can compute it ONCE and derive both
    * channels from it instead of paying the full equi-join twice.
    * NOT deduped — see [[pairVerify]].
    */
  private[graft] def cellBaseVerified(assigned: DataFrame, probes: DataFrame,
      q: DataFrame, nVec: Long): DataFrame = {
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    val l = probes.join(qn.select(col("vec_id").as("va"),
      col("qv").as("qa"), col("nrm").as("na")), "va")
    val r = assigned.select(col("vec_id").as("vb"), col("cl"))
      .join(qn.select(col("vec_id").as("vb"),
        col("qv").as("qb"), col("nrm").as("nb")), "vb")
    val paired =
      if (nVec <= KnnBroadcastCap) l.join(broadcast(r), Seq("cl"))
      else l.join(r, Seq("cl"))
    pairVerify(paired)
  }

  /** RING channel: the SRP-screened boundary pairs, vector-fetched and
    * verified. The ring's vector fetch keys on vec_id with the
    * SURVIVOR set on the probe side — below the cap the corpus side
    * broadcasts (BroadcastHashJoin streams the ring rows; a sort-merge
    * join here sorts the ring side TWICE, which at a 100×-replica
    * probe was hundreds of millions of rows of pure spill), above it
    * the ring side shuffles exactly like the cell join. NOT deduped —
    * see [[pairVerify]].
    */
  private[graft] def ringVerified(rp: DataFrame, q: DataFrame, nVec: Long): DataFrame = {
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    val qa = qn.select(col("vec_id").as("va"),
      col("qv").as("qa"), col("nrm").as("na"))
    val qb = qn.select(col("vec_id").as("vb"),
      col("qv").as("qb"), col("nrm").as("nb"))
    val fetched =
      if (nVec <= KnnBroadcastCap) rp.join(broadcast(qa), "va").join(broadcast(qb), "vb")
      else rp.join(qa, "va").join(qb, "vb")
    pairVerify(fetched)
  }

  /** [[cellNearDupPairs]] as a first-class query: every verified
    * near-dup pair with its (bit-deterministic) micro-unit cosine.
    * This is the scale route `dedup_embedding_cosine` takes above
    * [[EmbExactCap]], exposed directly so the candidate generator is
    * oracle-gated at test scale in its own right (the oracle replays
    * the Lloyd's chain, the probe ranking, the cell pair join, and
    * every cosine verdict).
    */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    cellNearDupPairs(spark, dir).orderBy("vec_a", "vec_b")

  val dedupEmbeddingLshSql: String =
    s"""WITH $kmeansCtes,
       |$cellProbeCtes,
       |cand AS (
       |  SELECT DISTINCT least(p.va, y.vec_id) AS vec_a,
       |    greatest(p.va, y.vec_id) AS vec_b,
       |    list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) AS sim
       |  FROM p JOIN a$KmIters y ON y.cl = p.cl AND y.vec_id != p.va
       |  JOIN q qx ON qx.vec_id = p.va
       |  JOIN q qy ON qy.vec_id = y.vec_id
       |  JOIN n nx ON nx.vec_id = p.va
       |  JOIN n ny ON ny.vec_id = y.vec_id
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $DupThreshold)
       |SELECT vec_a, vec_b, sim FROM cand ORDER BY vec_a, vec_b""".stripMargin

  // --------------------------------------------- embedding_neardup_recall

  /** Anchor cap for the recall audit's exact ground truth: truth
    * pairs anchor on the [[RecallAnchors]] lowest vec_ids, so the
    * exact side costs O(anchors · n) — a fixed query panel, never n²
    * — while still covering the WHOLE corpus at the driver's oracle
    * scale (500 vectors).
    */
  private val RecallAnchors = 500

  /** MEASURED end-to-end recall of the scale route against exact
    * ground truth, per similarity bucket — the `lsh_recall_audit`
    * pattern applied to the embedding side: every true float-cosine-
    * ≥ τ pair anchored on a fixed query panel is checked for
    * membership in the route's VERIFIED output ([[cellNearDupPairs]]
    * — what `dedup_embedding_cosine` actually emits above the cap),
    * so BOTH loss channels are inside the measurement: candidate
    * misses (cell boundaries) AND verify misses (a pair whose float
    * cosine clears τ but whose micro-unit cosine lands an ulp under —
    * the quantization band at the threshold boundary). Buckets are on
    * the micro-unit cosine (bit-deterministic), truth verdicts on the
    * float cosine (the `dedup_embedding_cosine` contract).
    */
  def embeddingNeardupRecall(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val a = withUnit(e, "vec_a", "ua").filter(col("vec_a") < RecallAnchors)
    val b = withUnit(e, "vec_b", "ub")
    val truth = a.join(b, col("vec_a") < col("vec_b"))
      .filter(unitDot(col("ua"), col("ub")) >= DupThreshold)
      .select(col("vec_a"), col("vec_b"))
    val (_, q, _, _) = kmeansAssign(spark, dir)
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    val cand = cellNearDupPairs(spark, dir)
      .select(col("vec_a"), col("vec_b"))
      .withColumn("hit", lit(1L))
    truth
      .join(qn.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("nrm").as("na")), "vec_a")
      .join(qn.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("nrm").as("nb")), "vec_b")
      .filter(col("na") * col("nb") > 0)
      .withColumn("simq", call_function("graft_dot", col("qa"), col("qb")) /
        (col("na") * col("nb")))
      .join(cand, Seq("vec_a", "vec_b"), "left")
      .withColumn("bucket", expr("least(CAST(floor(simq * 10) AS INTEGER), 9)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .selectExpr("CAST(bucket AS BIGINT) AS bucket",
        "CAST(n_true AS BIGINT) AS n_true", "CAST(n_hit AS BIGINT) AS n_hit",
        """CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall""".stripMargin)
      .orderBy("bucket")
  }

  val embeddingNeardupRecallSql: String =
    s"""WITH $kmeansCtes,
       |$cellProbeCtes,
       |cand AS (
       |  SELECT DISTINCT least(p.va, y.vec_id) AS va, greatest(p.va, y.vec_id) AS vb
       |  FROM p JOIN a$KmIters y ON y.cl = p.cl AND y.vec_id != p.va
       |  JOIN q qx ON qx.vec_id = p.va
       |  JOIN q qy ON qy.vec_id = y.vec_id
       |  JOIN n nx ON nx.vec_id = p.va
       |  JOIN n ny ON ny.vec_id = y.vec_id
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $DupThreshold),
       |truth AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE a.vec_id < $RecallAnchors
       |    AND list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold),
       |qs AS (
       |  SELECT t.va, t.vb,
       |    list_dot_product(qa.qv, qb.qv) / (na.nrm * nb.nrm) AS simq
       |  FROM truth t
       |  JOIN q qa ON qa.vec_id = t.va
       |  JOIN q qb ON qb.vec_id = t.vb
       |  JOIN n na ON na.vec_id = t.va
       |  JOIN n nb ON nb.vec_id = t.vb
       |  WHERE na.nrm * nb.nrm > 0),
       |au AS (
       |  SELECT qs.simq, CASE WHEN c.va IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM qs LEFT JOIN cand c ON c.va = qs.va AND c.vb = qs.vb),
       |g AS (
       |  SELECT least(CAST(floor(simq * 10) AS INTEGER), 9) AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_true, CAST(sum(hit) AS BIGINT) AS n_hit
       |  FROM au GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n_true, n_hit,
       |  CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall
       |FROM g ORDER BY bucket""".stripMargin

  // --------------------------------------------------- ann_twolevel_recall

  /** The forced two-level quantizer for the oracle gate: k = 20 over
    * the sf0.01 corpus is the smallest geometry where BOTH hierarchy
    * levels are non-degenerate (k₂ = 5 supers × 4 children,
    * [[SuperProbe]] = 5 selective at neither level's floor) while the
    * oracle CTE chain stays a fixed unroll.
    */
  private[graft] val TwoLevelForceK = 20

  /** End-to-end recall of the TWO-LEVEL quantizer route (round 16,
    * VERDICT r15 #3) against exact anchored ground truth — the
    * `embedding_neardup_recall` audit pointed at the hierarchy,
    * FORCED to k = [[TwoLevelForceK]] so the scale branch (which only
    * activates above [[TwoLevelK]] cells, beyond every oracle-gated
    * dir) is itself oracle-gated at test scale: the DuckDB side
    * replays the level-1 Lloyd's at k₂, the group-keyed level-2
    * Lloyd's (init = each super's lowest-id members, empty children
    * carried), the super ranking, the child ranking with the
    * corpus-scaled probe width, the home-cell union, the cell pair
    * join, and every exact micro-unit cosine verdict. The same
    * construction un-forced is what `dedup_embedding_cosine` (and the
    * whole near-dup family) runs above TwoLevelK cells, where flat
    * assignment would be O(n·k) = O(n²/1000).
    */
  /** Verified BASE-channel pair frame at the forced two-level
    * geometry — SESSION-SHARED (round 18): the recall audit and the
    * ring-contribution audit otherwise EACH pay the same nprobe-wide
    * cell equi-join, the heaviest scan either runs (τ-survivor-sized
    * persisted frame, the cellNearDupPairs rule). Same bit-exact set
    * on both consumers by construction.
    */
  /** Materialize `df` behind a lineage cut (persisted RDD →
    * createDataFrame) and hand the SHALLOW frame to SharedFrames: the
    * two-consumer pair frames are τ-survivor-sized (hundreds of rows)
    * but their raw plans embed the whole hier chain, and Catalyst
    * re-analyzes that tree on EVERY downstream action — measured ~1 s
    * per count on a fully cached 737-row frame, ~4 s for the final
    * channel agg. The eager count after get() pins the shallow blocks
    * before the owned backing RDD is released post-query.
    */
  private def severedShared(spark: SparkSession, key: String, dir: String,
      consumers: Set[String])(build: => DataFrame): DataFrame = {
    val f = graft.core.SharedFrames.get(spark, key, dir, consumers) {
      val df = build
      val rdd = df.rdd
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      graft.core.OwnedCaches.ownRdd(rdd)
      spark.createDataFrame(rdd, df.schema)
    }
    f.count()
    f
  }

  private[graft] def forcedTwolevelBasePairs(spark: SparkSession, dir: String): DataFrame =
    severedShared(spark, "ann.twolevel.basePairs", dir,
        Set("ann_twolevel_recall", "twolevel_ring_contribution")) {
      val (q, nVec) = quantizedCorpus(spark, dir)
      val (assign, probes, _) = hierCellFrames(spark, dir, Some(TwoLevelForceK))
      cellBaseVerified(assign, probes, q, nVec).distinct()
    }

  /** Verified RING-channel pair frame at the forced geometry — the
    * same two-consumer sharing as [[forcedTwolevelBasePairs]] (the
    * SRP-survivor vector fetch + exact verify is the other scan both
    * audits pay).
    */
  private[graft] def forcedTwolevelRingPairs(spark: SparkSession, dir: String): DataFrame =
    severedShared(spark, "ann.twolevel.ringPairs", dir,
        Set("ann_twolevel_recall", "twolevel_ring_contribution")) {
      val (q, nVec) = quantizedCorpus(spark, dir)
      val (_, _, ring) = hierCellFrames(spark, dir, Some(TwoLevelForceK))
      ringVerified(ring, q, nVec).distinct()
    }

  def annTwolevelRecall(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val a = withUnit(e, "vec_a", "ua").filter(col("vec_a") < RecallAnchors)
    val b = withUnit(e, "vec_b", "ub")
    val truth = a.join(b, col("vec_a") < col("vec_b"))
      .filter(unitDot(col("ua"), col("ub")) >= DupThreshold)
      .select(col("vec_a"), col("vec_b"))
    val (q, _) = quantizedCorpus(spark, dir)
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    // (shared base ∪ shared ring).distinct ≡ cellPairScan(…,
    // Some(ring)) — both frames are distinct'd and the verify is
    // bit-identical across channels, so the union-distinct collapses
    // identically
    val cand = forcedTwolevelBasePairs(spark, dir)
      .unionByName(forcedTwolevelRingPairs(spark, dir))
      .distinct()
      .select(col("vec_a"), col("vec_b")).withColumn("hit", lit(1L))
    truth
      .join(qn.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("nrm").as("na")), "vec_a")
      .join(qn.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("nrm").as("nb")), "vec_b")
      .filter(col("na") * col("nb") > 0)
      .withColumn("simq", call_function("graft_dot", col("qa"), col("qb")) /
        (col("na") * col("nb")))
      .join(cand, Seq("vec_a", "vec_b"), "left")
      .withColumn("bucket", expr("least(CAST(floor(simq * 10) AS INTEGER), 9)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .selectExpr("CAST(bucket AS BIGINT) AS bucket",
        "CAST(n_true AS BIGINT) AS n_true", "CAST(n_hit AS BIGINT) AS n_hit",
        """CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall""".stripMargin)
      .orderBy("bucket")
  }

  /** Children per super-cell at the forced oracle geometry. */
  private def twoLevelKc: Int = {
    val k2 = math.ceil(math.sqrt(TwoLevelForceK.toDouble)).toInt
    (TwoLevelForceK + k2 - 1) / k2
  }

  /** The forced-k two-level construction as one shared CTE prelude —
    * level-1 chain, members, level-2 group-keyed chain, home cells
    * (`h`), super/child rankings and the home-union probe set (`p`) —
    * spliced verbatim into every oracle that replays the hierarchy
    * (`ann_twolevel_recall`, `twolevel_cell_occupancy`), so the
    * gates cannot drift.
    */
  private lazy val twolevelCtes: String = {
    val k = TwoLevelForceK
    val k2 = math.ceil(math.sqrt(k.toDouble)).toInt
    val kc = twoLevelKc
    val np = nprobeFor(k)
    def d2(v: String, c: String): String =
      s"list_dot_product($v, $v) - 2*list_dot_product($v, $c) + list_dot_product($c, $c)"
    // the group-keyed level-2 Lloyd's, unrolled (the kmeansCtesFor
    // recipe with every join keyed on the super cell)
    val l2 = (1 to KmIters).flatMap { i =>
      val asg =
        s"""asg$i AS (
           |  SELECT vec_id, scl, ch FROM (
           |    SELECT m.vec_id, m.scl, c.ch,
           |      row_number() OVER (PARTITION BY m.vec_id ORDER BY
           |        ${d2("m.qv", "c.cv")}, c.ch) AS rk
           |    FROM m JOIN ch${i - 1} c ON c.scl = m.scl) z WHERE rk = 1)""".stripMargin
      val upd = if (i >= KmIters) Nil else Seq(
        s"""chs$i AS (
           |  SELECT a.scl, a.ch, dim, floor(CAST(sum(v) AS DOUBLE) / count(*)) AS cvd
           |  FROM asg$i a JOIN mex ON mex.vec_id = a.vec_id AND mex.scl = a.scl
           |  GROUP BY a.scl, a.ch, dim),
           |ch$i AS (
           |  SELECT scl, ch, list(cvd ORDER BY dim) AS cv FROM chs$i GROUP BY scl, ch
           |  UNION ALL
           |  SELECT c.scl, c.ch, c.cv FROM ch${i - 1} c
           |  WHERE NOT EXISTS (SELECT 1 FROM chs$i s WHERE s.scl = c.scl AND s.ch = c.ch))""".stripMargin)
      Seq(asg) ++ upd
    }.mkString(",\n")
    s"""${kmeansCtesFor(k2, "sc", "sa", withBase = true)},
       |n AS (SELECT vec_id, sqrt(list_dot_product(qv, qv)) AS nrm FROM q),
       |m AS (SELECT s.vec_id, s.cl AS scl, q.qv FROM sa$KmIters s JOIN q ON q.vec_id = s.vec_id),
       |mex AS (
       |  SELECT vec_id, scl, CAST(generate_subscripts(qv,1)-1 AS INTEGER) AS dim,
       |         unnest(qv) AS v
       |  FROM m),
       |ch0 AS (
       |  SELECT scl, CAST(rn - 1 AS BIGINT) AS ch, qv AS cv FROM (
       |    SELECT scl, vec_id, qv,
       |      row_number() OVER (PARTITION BY scl ORDER BY vec_id) AS rn
       |    FROM m) z WHERE rn <= $kc),
       |$l2,
       |h AS (SELECT vec_id, scl * $kc + ch AS cl FROM asg$KmIters),
       |sup AS (
       |  SELECT va, scl FROM (
       |    SELECT q.vec_id AS va, c.cl AS scl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${d2("q.qv", "c.cv")}, c.cl) AS rk
       |    FROM q CROSS JOIN sc${KmIters - 1} c) z WHERE rk <= $SuperProbe),
       |rkd AS (
       |  SELECT va, cl, rk FROM (
       |    SELECT s.va, c.scl * $kc + c.ch AS cl,
       |      row_number() OVER (PARTITION BY s.va ORDER BY
       |        ${d2("q.qv", "c.cv")}, c.scl * $kc + c.ch) AS rk
       |    FROM sup s JOIN q ON q.vec_id = s.va
       |    JOIN ch${KmIters - 1} c ON c.scl = s.scl) z WHERE rk <= ${ringDepthFor(k)}),
       |pr AS (SELECT va, cl FROM rkd WHERE rk <= $np),
       |p AS (
       |  SELECT DISTINCT va, cl FROM (
       |    SELECT va, cl FROM pr
       |    UNION ALL SELECT vec_id AS va, cl FROM h) u),
       |srpg AS (
       |  SELECT j, d,
       |    CASE WHEN ('0x'||substr(md5('srp_'||CAST(j AS VARCHAR)||'_'||CAST(d AS VARCHAR)),1,1))::BIGINT & 1 = 1 THEN 1 ELSE -1 END AS w
       |  FROM (SELECT unnest(range(126)) AS j) a, (SELECT unnest(range(64)) AS d) b),
       |qx2 AS (SELECT vec_id, unnest(qv) AS v, generate_subscripts(qv,1)-1 AS d FROM q),
       |srpd AS (SELECT e.vec_id, g.j, sum(g.w * e.v) AS s
       |         FROM qx2 e JOIN srpg g ON g.d = e.d GROUP BY 1, 2),
       |srps AS (SELECT vec_id,
       |    CAST(sum(CASE WHEN s > 0 AND j < 63 THEN (1::BIGINT << (j % 63)) ELSE 0 END) AS BIGINT) AS s0,
       |    CAST(sum(CASE WHEN s > 0 AND j >= 63 THEN (1::BIGINT << (j % 63)) ELSE 0 END) AS BIGINT) AS s1
       |  FROM srpd GROUP BY 1),
       |rp AS (
       |  SELECT r.va, y.vec_id AS vb
       |  FROM rkd r JOIN h y ON y.cl = r.cl AND y.vec_id != r.va
       |  JOIN srps sa ON sa.vec_id = r.va
       |  JOIN srps sb ON sb.vec_id = y.vec_id
       |  WHERE r.rk > $np
       |    AND bit_count(xor(sa.s0, sb.s0)) + bit_count(xor(sa.s1, sb.s1)) <= $RingHammingCap)""".stripMargin
  }

  lazy val annTwolevelRecallSql: String =
    s"""WITH $twolevelCtes,
       |uc AS (
       |  SELECT p.va, y.vec_id AS vb
       |  FROM p JOIN h y ON y.cl = p.cl AND y.vec_id != p.va
       |  UNION ALL
       |  SELECT va, vb FROM rp),
       |cand AS (
       |  SELECT DISTINCT least(u.va, u.vb) AS va, greatest(u.va, u.vb) AS vb
       |  FROM uc u
       |  JOIN q qx ON qx.vec_id = u.va
       |  JOIN q qy ON qy.vec_id = u.vb
       |  JOIN n nx ON nx.vec_id = u.va
       |  JOIN n ny ON ny.vec_id = u.vb
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $DupThreshold),
       |truth AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE a.vec_id < $RecallAnchors
       |    AND list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold),
       |qs AS (
       |  SELECT t.va, t.vb,
       |    list_dot_product(qa.qv, qb.qv) / (na.nrm * nb.nrm) AS simq
       |  FROM truth t
       |  JOIN q qa ON qa.vec_id = t.va
       |  JOIN q qb ON qb.vec_id = t.vb
       |  JOIN n na ON na.vec_id = t.va
       |  JOIN n nb ON nb.vec_id = t.vb
       |  WHERE na.nrm * nb.nrm > 0),
       |au AS (
       |  SELECT qs.simq, CASE WHEN c.va IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM qs LEFT JOIN cand c ON c.va = qs.va AND c.vb = qs.vb),
       |g AS (
       |  SELECT least(CAST(floor(simq * 10) AS INTEGER), 9) AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_true, CAST(sum(hit) AS BIGINT) AS n_hit
       |  FROM au GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n_true, n_hit,
       |  CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall
       |FROM g ORDER BY bucket""".stripMargin

  // ------------------------------------------------ ann_probe_width_curve

  /** Probe widths swept by the coverage curve — up to one past the
    * production [[KnnProbe]], so the marginal-recall-per-extra-probe
    * read is visible on BOTH sides of the shipped width.
    */
  private val ProbeCurveMaxW = 4

  /** Candidate-COVERAGE recall vs probe width w = 1…[[ProbeCurveMaxW]]
    * on the flat quantizer — the nprobe TUNING curve: for every
    * anchored true pair, the smallest width whose (probe, resident)
    * cell join covers it (either direction), then per-width recall.
    * This is the structural-recall component only (cell geometry —
    * what widening nprobe buys); the verify-band loss on top of it is
    * `embedding_neardup_recall`'s measurement, and the occupancy-
    * adaptive WALK promoted in round 18 is exactly a per-vector
    * re-allocation along this curve's budget axis. All ranks exact
    * integer distances; recall one divide.
    *
    * Scale shape: the pool is n·maxW narrow rows off the same
    * broadcast centroid ranking as [[cellProbes]]; truth is
    * anchor-bounded (never n²); the cover rank is two probe-side
    * equi-joins on the anchored pair set.
    */
  def annProbeWidthCurve(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val (assigned, q, centroids, _) = kmeansAssign(spark, dir)
    val d2 = call_function("graft_dot", col("qv"), col("qv")) -
      lit(2.0) * call_function("graft_dot", col("qv"), col("cv")) +
      call_function("graft_dot", col("cv"), col("cv"))
    val wProbe = Window.partitionBy(col("va")).orderBy(col("d2"), col("cl"))
    val pool = q.crossJoin(broadcast(centroids))
      .select(col("vec_id").as("va"), col("cl"), d2.as("d2"))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= ProbeCurveMaxW)
      .select(col("va"), col("cl"), col("rk"))
    val home = assigned.select(col("vec_id"), col("cl"))
    val e = Tables(spark, dir).embeddings
    val a = withUnit(e, "vec_a", "ua").filter(col("vec_a") < RecallAnchors)
    val b = withUnit(e, "vec_b", "ub")
    val truth = a.join(b, col("vec_a") < col("vec_b"))
      .filter(unitDot(col("ua"), col("ub")) >= DupThreshold)
      .select(col("vec_a"), col("vec_b"))
    val dir1 = truth
      .join(pool.select(col("va").as("vec_a"), col("cl"), col("rk")), Seq("vec_a"))
      .join(home.select(col("vec_id").as("vec_b"), col("cl").as("hb")), Seq("vec_b"))
      .filter(col("cl") === col("hb"))
      .select(col("vec_a"), col("vec_b"), col("rk"))
    val dir2 = truth
      .join(pool.select(col("va").as("vec_b"), col("cl"), col("rk")), Seq("vec_b"))
      .join(home.select(col("vec_id").as("vec_a"), col("cl").as("ha")), Seq("vec_a"))
      .filter(col("cl") === col("ha"))
      .select(col("vec_a"), col("vec_b"), col("rk"))
    val cover = dir1.unionByName(dir2)
      .groupBy(col("vec_a"), col("vec_b")).agg(min(col("rk")).as("min_rk"))
    val sess = spark
    import sess.implicits._
    val widths = (1 to ProbeCurveMaxW).map(_.toLong).toDF("width")
    truth.join(cover, Seq("vec_a", "vec_b"), "left")
      .crossJoin(broadcast(widths))
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("min_rk") <= col("width"), 1L).otherwise(0L)).as("n_hit"))
      .selectExpr("CAST(width AS BIGINT) AS width",
        "CAST(n_true AS BIGINT) AS n_true", "CAST(n_hit AS BIGINT) AS n_hit",
        """CASE WHEN n_true = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall""".stripMargin)
      .orderBy("width")
  }

  lazy val annProbeWidthCurveSql: String =
    s"""WITH $kmeansCtes,
       |pool AS (
       |  SELECT vec_id AS va, cl, rk FROM (
       |    SELECT q.vec_id, c.cl,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv) + list_dot_product(c.cv, c.cv), c.cl) AS rk
       |    FROM q CROSS JOIN c${KmIters - 1} c) z WHERE rk <= $ProbeCurveMaxW),
       |home AS (SELECT vec_id, cl FROM a$KmIters),
       |truth AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE a.vec_id < $RecallAnchors
       |    AND list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold),
       |cover AS (
       |  SELECT va, vb, min(rk) AS min_rk FROM (
       |    SELECT t.va, t.vb, p.rk
       |    FROM truth t
       |    JOIN pool p ON p.va = t.va
       |    JOIN home h ON h.vec_id = t.vb AND h.cl = p.cl
       |    UNION ALL
       |    SELECT t.va, t.vb, p.rk
       |    FROM truth t
       |    JOIN pool p ON p.va = t.vb
       |    JOIN home h ON h.vec_id = t.va AND h.cl = p.cl) u
       |  GROUP BY 1, 2),
       |widths AS (SELECT unnest(generate_series(1, $ProbeCurveMaxW)) AS width)
       |SELECT CAST(w.width AS BIGINT) AS width,
       |  CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(sum(CASE WHEN c.min_rk <= w.width THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CASE WHEN count(*) = 0 THEN CAST(0 AS DOUBLE)
       |    ELSE CAST(sum(CASE WHEN c.min_rk <= w.width THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |  END AS recall
       |FROM truth t LEFT JOIN cover c ON c.va = t.va AND c.vb = t.vb
       |CROSS JOIN widths w
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ twolevel_cell_occupancy

  /** Per-cell occupancy audit of the TWO-LEVEL quantizer (forced
    * k = [[TwoLevelForceK]]) — the `ivf_cell_occupancy` /
    * `srp_bucket_occupancy` rule applied to the round-16 candidate
    * generator: every generator ships its Σc(c−1)/2 candidate-pair
    * bound, so a collapsed level (one super absorbing the corpus, or
    * an empty-child pileup) is observable per run BEFORE a pair join
    * pays for it. One groupBy over the home assignment; k rows out.
    */
  def twolevelCellOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val (assign, _, _) = hierCellFrames(spark, dir, Some(TwoLevelForceK))
    val kc = twoLevelKc
    assign.groupBy(col("cl")).agg(count(lit(1)).as("c"))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy()))
      .selectExpr(s"CAST(cl div $kc AS BIGINT) AS super_cell",
        "CAST(cl AS BIGINT) AS cell", "CAST(c AS BIGINT) AS n_vectors",
        "CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS cell_share",
        "CAST(c * (c - 1) div 2 AS BIGINT) AS pair_bound")
      .orderBy("cell")
  }

  lazy val twolevelCellOccupancySql: String =
    s"""WITH $twolevelCtes
       |SELECT CAST(cl // $twoLevelKc AS BIGINT) AS super_cell,
       |  CAST(cl AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM h) AS DOUBLE) AS cell_share,
       |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS pair_bound
       |FROM h GROUP BY cl ORDER BY cell""".stripMargin

  // ----------------------------------------- twolevel_ring_contribution

  /** Per-channel yield of the routed candidate generator (round 17,
    * VERDICT r16 #2), forced to k = [[TwoLevelForceK]] so the SRP
    * boundary ring is oracle-gated at test scale: every VERIFIED
    * near-dup pair is attributed to the channel that produced it —
    * `base` (the nprobe-wide cell equi-join) or `ring_only` (pairs
    * ONLY the hamming-screened boundary ring reaches) — and bucketed
    * by its exact micro-unit cosine. The ring exists to buy
    * τ-boundary depth without widening the exact-verify channel, so
    * its contribution should concentrate in the low buckets; a
    * ring_only count in the high buckets would mean the base probe
    * width is mis-sized. The DuckDB side replays both channels —
    * the two-level Lloyd's chain, the probe union, the SRP
    * signatures, the hamming screen, and every cosine verdict.
    */
  def twolevelRingContribution(spark: SparkSession, dir: String): DataFrame = {
    // VERDICT r17 #1: both channel scans are SESSION-SHARED with
    // ann_twolevel_recall (each verified once per session, τ-survivor-
    // sized persisted frames) — this query is pure cached-frame
    // algebra: one anti-join + one union + one agg. ring_only =
    // verified-ring \ base is set-identical to the old
    // (base ∪ ring).distinct \ base because the verify gate is
    // per-pair deterministic and bit-identical across channels. Both
    // getters materialize eagerly (severedShared), so the two legs
    // read pinned shallow blocks — no cache race, no re-analysis of
    // the hier lineage.
    val base = forcedTwolevelBasePairs(spark, dir)
    val ringOnly = forcedTwolevelRingPairs(spark, dir)
      .join(base.select(col("vec_a"), col("vec_b")),
        Seq("vec_a", "vec_b"), "left_anti")
    base.withColumn("channel", lit("base"))
      .unionByName(ringOnly.withColumn("channel", lit("ring_only")))
      .withColumn("bucket", expr("least(CAST(floor(sim * 10) AS INTEGER), 9)"))
      .groupBy(col("channel"), col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .selectExpr("channel", "CAST(bucket AS BIGINT) AS bucket",
        "CAST(n_pairs AS BIGINT) AS n_pairs")
      .orderBy("channel", "bucket")
  }

  lazy val twolevelRingContributionSql: String =
    s"""WITH $twolevelCtes,
       |base AS (
       |  SELECT DISTINCT least(p.va, y.vec_id) AS vec_a,
       |    greatest(p.va, y.vec_id) AS vec_b,
       |    list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) AS sim
       |  FROM p JOIN h y ON y.cl = p.cl AND y.vec_id != p.va
       |  JOIN q qx ON qx.vec_id = p.va
       |  JOIN q qy ON qy.vec_id = y.vec_id
       |  JOIN n nx ON nx.vec_id = p.va
       |  JOIN n ny ON ny.vec_id = y.vec_id
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $DupThreshold),
       |ringv AS (
       |  SELECT DISTINCT least(r.va, r.vb) AS vec_a,
       |    greatest(r.va, r.vb) AS vec_b,
       |    list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) AS sim
       |  FROM rp r
       |  JOIN q qx ON qx.vec_id = r.va
       |  JOIN q qy ON qy.vec_id = r.vb
       |  JOIN n nx ON nx.vec_id = r.va
       |  JOIN n ny ON ny.vec_id = r.vb
       |  WHERE nx.nrm * ny.nrm > 0
       |    AND list_dot_product(qx.qv, qy.qv) / (nx.nrm * ny.nrm) >= $DupThreshold),
       |ring_only AS (
       |  SELECT * FROM ringv
       |  WHERE NOT EXISTS (SELECT 1 FROM base b
       |    WHERE b.vec_a = ringv.vec_a AND b.vec_b = ringv.vec_b)),
       |u AS (
       |  SELECT 'base' AS channel, sim FROM base
       |  UNION ALL SELECT 'ring_only' AS channel, sim FROM ring_only)
       |SELECT channel,
       |  CAST(least(CAST(floor(sim * 10) AS INTEGER), 9) AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM u GROUP BY 1, 2 ORDER BY channel, bucket""".stripMargin

  // --------------------------------------------------- ann_adaptive_nprobe

  /** Occupancy-adaptive probe-width audit (round 17, VERDICT r16 #2's
    * "probe until a candidate-mass target" design, as an oracled
    * query at the forced two-level geometry): each probing vector
    * walks its ranked cell pool in rank order and stops once the
    * CUMULATIVE home-cell mass before a cell reaches
    * 4·⌈n/k⌉ (four average cells) — skewed layouts reach the target
    * in fewer, shallower probes; sparse ones walk deeper at the same
    * candidate cost, which is exactly the trade a fixed nprobe cannot
    * make. Output is the distribution of probes used with the average
    * candidate mass actually admitted — the two numbers that say
    * whether probe COUNT or candidate VOLUME is the binding cost.
    * The pool is capped at [[ringDepthFor]], so the walk is bounded
    * either way; everything is exact integers except the one avg
    * division.
    */
  def annAdaptiveNprobe(spark: SparkSession, dir: String): DataFrame = {
    val (q, nVec) = quantizedCorpus(spark, dir)
    val k = TwoLevelForceK
    val (assign, _, _) = hierCellFrames(spark, dir, Some(k))
    val ranked = hierRankedPool(spark, dir, Some(k))
    val target = 4L * ((nVec + k - 1) / k)
    val occ = assign.groupBy(col("cl")).agg(count(lit(1)).as("mass"))
    val wBefore = Window.partitionBy("va").orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = ranked.join(occ, Seq("cl"), "left")
      .select(col("va"), col("rk"), coalesce(col("mass"), lit(0L)).as("mass"))
      .withColumn("before", coalesce(sum(col("mass")).over(wBefore), lit(0L)))
    cum.filter(col("before") < lit(target))
      .groupBy(col("va"))
      .agg(count(lit(1)).as("probes_used"), sum(col("mass")).as("cand_mass"))
      .groupBy(col("probes_used"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("cand_mass")).as("tot_mass"))
      .selectExpr("CAST(probes_used AS BIGINT) AS probes_used",
        "CAST(n_vectors AS BIGINT) AS n_vectors",
        "CAST(tot_mass AS DOUBLE) / CAST(n_vectors AS DOUBLE) AS avg_cand_mass")
      .orderBy("probes_used")
  }

  lazy val annAdaptiveNprobeSql: String = {
    val k = TwoLevelForceK
    s"""WITH $twolevelCtes,
       |tgt AS (SELECT 4 * ((count(*) + $k - 1) // $k) AS target FROM q),
       |occ AS (SELECT cl, count(*) AS mass FROM h GROUP BY 1),
       |cm AS (
       |  SELECT r.va, coalesce(o.mass, 0) AS mass,
       |    coalesce(sum(coalesce(o.mass, 0)) OVER (PARTITION BY r.va ORDER BY r.rk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM rkd r LEFT JOIN occ o ON o.cl = r.cl),
       |tk AS (
       |  SELECT va, count(*) AS probes_used, sum(mass) AS cand_mass
       |  FROM cm, tgt WHERE before < tgt.target GROUP BY va)
       |SELECT CAST(probes_used AS BIGINT) AS probes_used,
       |  CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(sum(cand_mass) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_cand_mass
       |FROM tk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------- dedup_embedding_incremental

  /** INCREMENTAL vector-corpus admission — the embedding face of the
    * text suite's `dedup_incremental` (round 15, VERDICT r14 #5):
    * screen an arriving vector batch (content-hash split on vec_id,
    * ≥90 bucket = "new") against the EXISTING corpus only, via the
    * same multi-probe cells as [[cellNearDupPairs]] — but the
    * candidate joins are (new probes × corpus residents) and (corpus
    * probes × new residents), never corpus², so re-ingesting a batch
    * costs O(batch · cell-size). Output: every new vector with its
    * corpus-duplicate count and the admit verdict (no near-dup at τ).
    * At 100 TB the persisted artifacts are the corpus residents' cell
    * assignments and probe lists (each computed once at its own
    * ingest) — the vector-store contract; batch ∪ corpus equivalence
    * with the full-corpus pair run is spec-pinned (a spanning pair
    * appears in the incremental screen iff it appears in
    * [[cellNearDupPairs]], by construction: both directions of the
    * probe relation are kept).
    */
  def dedupEmbeddingIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, probesF, ring, q, nVec) = nearDupCellFrames(spark, dir)
    val isNew = (id: org.apache.spark.sql.Column) =>
      conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int") % 100 >= 90
    val qn = q.withColumn("nrm", sqrt(call_function("graft_dot", col("qv"), col("qv"))))
    val probes = probesF
      .select(col("va"), col("cl"), isNew(col("va")).as("new_a"))
    val residents = assigned.select(col("vec_id").as("vb"), col("cl"),
      isNew(col("vec_id")).as("new_b"))
    // split-before-join: each join's output is batch-bounded, and the
    // corpus×corpus bulk never forms
    def side(p: DataFrame, r: DataFrame) =
      (if (nVec <= KnnBroadcastCap) p.join(broadcast(r), Seq("cl"))
       else p.join(r, Seq("cl")))
        .filter(col("va") =!= col("vb"))
    // the routed branch's ring channel spans here too (round 17): the
    // batch⟷corpus iff-equivalence with [[cellNearDupPairs]] holds by
    // construction only if BOTH candidate channels screen both ways
    val ringSpan = ring.map { rp =>
      val rn = rp.select(col("va"), col("vb"),
        isNew(col("va")).as("new_a"), isNew(col("vb")).as("new_b"))
      rn.filter(col("new_a") && !col("new_b"))
        .select(col("va").as("nid"), col("vb").as("oid"))
        .unionByName(rn.filter(!col("new_a") && col("new_b"))
          .select(col("vb").as("nid"), col("va").as("oid")))
    }
    val cellSpan = side(probes.filter(col("new_a")), residents.filter(!col("new_b")))
      .select(col("va").as("nid"), col("vb").as("oid"))
      .unionByName(side(probes.filter(!col("new_a")), residents.filter(col("new_b")))
        .select(col("vb").as("nid"), col("va").as("oid")))
    val spanning = ringSpan.fold(cellSpan)(cellSpan.unionByName(_)).distinct()
    // vector fetch: broadcast the corpus side below the cap (the
    // cellPairScan ring rule — a sort-merge join here sorts the
    // spanning-pair side, candidate-sized, for no reason)
    val qna = qn.select(col("vec_id").as("nid"), col("qv").as("qa"), col("nrm").as("na"))
    val qnb = qn.select(col("vec_id").as("oid"), col("qv").as("qb"), col("nrm").as("nb"))
    val dups = (if (nVec <= KnnBroadcastCap)
        spanning.join(broadcast(qna), "nid").join(broadcast(qnb), "oid")
      else spanning.join(qna, "nid").join(qnb, "oid"))
      .filter(col("na") * col("nb") > 0)
      .filter(call_function("graft_dot", col("qa"), col("qb")) /
        (col("na") * col("nb")) >= DupThreshold)
      .groupBy(col("nid"))
      .agg(count(lit(1)).cast("long").as("n_corpus_dups"))
    Tables(spark, dir).embeddings.select(col("vec_id"))
      .filter(isNew(col("vec_id")))
      .join(dups.withColumnRenamed("nid", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_corpus_dups"), lit(0L)).as("n_corpus_dups"),
        (coalesce(col("n_corpus_dups"), lit(0L)) === 0).as("admitted"))
      .orderBy("vec_id")
  }

  val dedupEmbeddingIncrementalSql: String =
    s"""WITH $kmeansCtes,
       |$cellProbeCtes,
       |sp AS (
       |  SELECT vec_id,
       |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 >= 90 AS is_new
       |  FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT CASE WHEN sa.is_new THEN p.va ELSE y.vec_id END AS nid,
       |    CASE WHEN sa.is_new THEN y.vec_id ELSE p.va END AS oid
       |  FROM p JOIN a$KmIters y ON y.cl = p.cl AND y.vec_id != p.va
       |  JOIN sp sa ON sa.vec_id = p.va
       |  JOIN sp sb ON sb.vec_id = y.vec_id
       |  WHERE sa.is_new != sb.is_new),
       |dups AS (
       |  SELECT nid, CAST(count(*) AS BIGINT) AS n_corpus_dups
       |  FROM cand
       |  JOIN q qa ON qa.vec_id = nid
       |  JOIN q qb ON qb.vec_id = oid
       |  JOIN n na ON na.vec_id = nid
       |  JOIN n nb ON nb.vec_id = oid
       |  WHERE na.nrm * nb.nrm > 0
       |    AND list_dot_product(qa.qv, qb.qv) / (na.nrm * nb.nrm) >= $DupThreshold
       |  GROUP BY nid)
       |SELECT s.vec_id,
       |  coalesce(d.n_corpus_dups, 0) AS n_corpus_dups,
       |  coalesce(d.n_corpus_dups, 0) = 0 AS admitted
       |FROM sp s LEFT JOIN dups d ON d.nid = s.vec_id
       |WHERE s.is_new ORDER BY s.vec_id""".stripMargin

  // ------------------------------------------------ embedding_hubness_audit

  /** HUBNESS audit of the corpus kNN graph: the distribution of
    * k-occurrence (how often each vector appears as someone's
    * neighbor) — the classic high-dimensional metric-health readout
    * (Radovanović et al., JMLR'10): a healthy space has in-degree
    * concentrated near k; a degrading one grows hub vectors with huge
    * in-degree and "anti-hubs" that are nobody's neighbor (the
    * in_degree = 0 row), which silently bias every kNN-derived
    * decision (semdedup pruning, kNN labels, retrieval). Pure integer
    * counting over the session-shared [[knnGraph]] frame — eval cost
    * is the graph's n·k rows, never the corpus pair space.
    */
  def embeddingHubnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val g = knnGraph(spark, dir)
    val indeg = g.groupBy(col("neighbor_id").as("vec_id"))
      .agg(count(lit(1)).as("d"))
    Tables(spark, dir).embeddings.select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .select(coalesce(col("d"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vectors"))
      .selectExpr("CAST(in_degree AS BIGINT) AS in_degree",
        "CAST(n_vectors AS BIGINT) AS n_vectors")
      .orderBy("in_degree")
  }

  lazy val embeddingHubnessAuditSql: String =
    s"""WITH g AS ($knnGraphSql),
       |ind AS (
       |  SELECT e.vec_id, CAST(count(g.vec_id) AS BIGINT) AS d
       |  FROM embeddings e LEFT JOIN g ON g.neighbor_id = e.vec_id
       |  GROUP BY e.vec_id)
       |SELECT d AS in_degree, CAST(count(*) AS BIGINT) AS n_vectors
       |FROM ind GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- knn_reciprocal_rate

  /** Reciprocal-neighbor rate of the kNN graph: the share of directed
    * edges whose reverse edge is also present. Low reciprocity is the
    * other face of hubness (hubs absorb in-edges they never return)
    * and the standard gate before using the graph symmetrically
    * (mutual-kNN clustering, UMAP-style graphs). One self-semi-join
    * on the shared n·k-row frame; counts exact, one final division.
    */
  def knnReciprocalRate(spark: SparkSession, dir: String): DataFrame = {
    val g = knnGraph(spark, dir).select(col("vec_id").as("a"), col("neighbor_id").as("b"))
    val recip = g.join(g.select(col("b").as("a"), col("a").as("b")),
      Seq("a", "b"), "left_semi")
    g.agg(count(lit(1)).cast("long").as("n_edges"))
      .crossJoin(recip.agg(count(lit(1)).cast("long").as("n_reciprocal")))
      .selectExpr("n_edges", "n_reciprocal",
        "n_reciprocal div 2 AS n_mutual_pairs",
        // n_edges = 0 (empty corpus) yields NULL/NaN division whose
        // representation the engines need not agree on — pin the
        // degenerate input to 0.0, matching the recall query's
        // n_true = 0 convention (ADVICE r15)
        "CASE WHEN n_edges = 0 THEN CAST(0 AS DOUBLE) " +
          "ELSE CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE) END AS reciprocal_rate")
  }

  lazy val knnReciprocalRateSql: String =
    s"""WITH g AS ($knnGraphSql),
       |e AS (SELECT vec_id AS a, neighbor_id AS b FROM g),
       |r AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocal
       |      FROM e JOIN e e2 ON e2.a = e.b AND e2.b = e.a),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
       |SELECT n_edges, n_reciprocal,
       |  n_reciprocal // 2 AS n_mutual_pairs,
       |  CASE WHEN n_edges = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE) END AS reciprocal_rate
       |FROM n, r""".stripMargin

  // ------------------------------------------------- srp_bucket_occupancy

  /** Per-table occupancy audit of the sign-random-projection LSH
    * tables — the `lsh_bucket_occupancy` / `ivf_cell_occupancy`
    * counterpart for the SRP family, completing the rule that every
    * candidate generator ships its own Σc(c−1)/2 candidate-pair bound
    * (the number its 100 TB argument rests on, observable per run:
    * a collapsed table — one bucket absorbing the corpus — shows up
    * here BEFORE a pair join pays for it). Map-side signatures, one
    * (table, bucket) count, 8 output rows.
    */
  def srpBucketOccupancy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.RademacherSketch.register(spark)
    Tables(spark, dir).embeddings
      .select(posexplode(call_function("graft_rademacher", col("embedding")))
        .as(Seq("tbl", "bucket")))
      .groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_buckets"), max(col("c")).as("max_occupancy"),
        sum(col("c") * (col("c") - 1)).as("cp2"))
      .selectExpr("CAST(tbl AS INTEGER) AS tbl", "CAST(n_buckets AS BIGINT) AS n_buckets",
        "CAST(max_occupancy AS BIGINT) AS max_occupancy",
        "cp2 div 2 AS candidate_pairs")
      .orderBy("tbl")
  }

  lazy val srpBucketOccupancySql: String = {
    import graft.functions.RademacherSketch.{NumTables, PlanesPerTable, Dim}
    s"""WITH q6 AS (SELECT vec_id, list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1e6) AS BIGINT)) AS q FROM embeddings),
       |ex AS (SELECT vec_id, unnest(q) AS qv, generate_subscripts(q, 1) - 1 AS d FROM q6),
       |grid AS (SELECT t, p, d,
       |    CASE WHEN ('0x'||substr(md5(CAST(t AS VARCHAR)||'_'||CAST(p AS VARCHAR)||'_'||CAST(d AS VARCHAR)),1,1))::BIGINT & 1 = 1 THEN 1 ELSE -1 END AS w
       |  FROM (SELECT unnest(range($NumTables)) AS t) a,
       |       (SELECT unnest(range($PlanesPerTable)) AS p) b,
       |       (SELECT unnest(range($Dim)) AS d) c),
       |dots AS (SELECT e.vec_id, g.t, g.p, sum(g.w * e.qv) AS s
       |         FROM ex e JOIN grid g ON g.d = e.d GROUP BY 1, 2, 3),
       |buckets AS (SELECT vec_id, t, sum(CASE WHEN s > 0 THEN (1::BIGINT<<p) ELSE 0 END) AS bucket
       |            FROM dots GROUP BY 1, 2),
       |occ AS (SELECT t, bucket, CAST(count(*) AS BIGINT) AS c FROM buckets GROUP BY 1, 2)
       |SELECT CAST(t AS INTEGER) AS tbl, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(c) AS BIGINT) AS max_occupancy,
       |  CAST(sum(c * (c - 1)) AS BIGINT) // 2 AS candidate_pairs
       |FROM occ GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ----------------------------------------------- embedding_keep_canonical

  /** Surviving vector corpus after near-dup collapse — the embedding
    * face of `dedup_keep_canonical`: keep each cosine-cluster's
    * canonical representative (its min-id member) plus every
    * unclustered vector. One anti-join against the (tiny)
    * non-canonical member list, so the corpus streams map-side at any
    * scale; the pair/cluster build inherits the family's corpus-cap
    * routing.
    */
  def embeddingKeepCanonical(spark: SparkSession, dir: String): DataFrame = {
    val dropped = embeddingDedupClusters(spark, dir)
      .filter(col("vec_id") =!= col("cluster_id"))
      .select(col("vec_id"))
    Tables(spark, dir).embeddings
      .join(broadcast(dropped), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }

  lazy val embeddingKeepCanonicalSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= $DupThreshold),
       |edges AS (SELECT va AS a, vb AS b FROM pairs
       |          UNION SELECT vb, va FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
       |  UNION
       |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.n),
       |cc AS (SELECT n AS vec_id, min(m) AS cluster_id FROM reach GROUP BY n)
       |SELECT e.vec_id, e.label
       |FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.vec_id
       |WHERE cc.vec_id IS NULL OR cc.cluster_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  // ----------------------------------------------------------------- mips_topk

  /** Maximum-inner-product top-k — the recommendation-scoring
    * retrieval mode (user·item preference), where magnitude matters
    * and cosine's normalization would erase it. Ranks by the dot of
    * the micro-unit quantized vectors (the q6 convention): every
    * product and sum is an exact integer < 2^53 in double arithmetic,
    * so the ranking is BIT-DETERMINISTIC across engines with no
    * adjacent-gap assumption at all.
    *
    * Scale shape: identical to `ann_topk_bruteforce` — the query set
    * broadcasts, the corpus side streams map-only through the codegen'd
    * dot, and only the per-query top-k survives the rank window. The
    * 100 TB candidate-bounding route is the standard MIPS-to-cosine
    * reduction (augment with √(M²−‖x‖²) and reuse the IVF/LSH paths) —
    * the exact scorer here is that route's re-rank kernel.
    */
  def mipsTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    def q6(idAs: String, qAs: String): DataFrame =
      e.select(col("vec_id").as(idAs),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6)).cast("double")).as(qAs))
    val q = q6("query_id", "q_emb").filter(col("query_id") < NumQueries)
    val c = q6("neighbor_id", "c_emb")
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", call_function("graft_dot", col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        expr("CAST(ip AS BIGINT)").as("ip_q12"))
      .orderBy("query_id", "rank")
  }

  val mipsTopkSql: String =
    s"""WITH q6 AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS DOUBLE) for x in embedding] AS qv
       |  FROM embeddings),
       |s AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.qv, c.qv) AS ip
       |  FROM q6 q JOIN q6 c ON q.vec_id != c.vec_id
       |  WHERE q.vec_id < $NumQueries),
       |r AS (
       |  SELECT query_id, neighbor_id, ip,
       |    row_number() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       |  CAST(ip AS BIGINT) AS ip_q12
       |FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------- embedding_top_eigen

  private val EigenIters = 3
  private val CScaleDiv = 1000000L // scatter-entry clamp (see Scaladoc)
  private val VScale = 1000L       // ∞-norm of the iterated vector
  private[graft] val EigenPerRowUs = 0.08 // measured: ReplayCalibrate

  /** Toward-zero signed division shared by both engines: Spark's
    * `div` truncates and DuckDB's `//` floors, which DISAGREE on
    * negatives — splitting the sign and dividing magnitudes makes
    * them identical (floor == trunc on non-negatives).
    */
  private def signedDivSpark(x: String, d: String): String =
    s"CASE WHEN $x < 0 THEN -((-($x)) div $d) ELSE ($x) div $d END"
  private def signedDivDuck(x: String, d: String): String =
    s"CASE WHEN $x < 0 THEN -((-($x)) // $d) ELSE ($x) // $d END"

  /** Principal component of the embedding corpus by power iteration —
    * the spectral summary behind PCA whitening, ANN dimension
    * ordering, and the "is there one dominant direction" collapse
    * check on an embedding table. [[EigenIters]] fixed iterations on
    * the INTEGER-QUANTIZED scatter matrix (the kmeans/oracle-unroll
    * recipe applied to linear algebra): scatter entries are exact
    * Σq_a·q_b sums clamped by [[CScaleDiv]] (sign-split division),
    * each mat-vec is an exact int64 sum, and renormalization is by
    * the ∞-norm (max |w|, an exact integer) instead of the L2 norm —
    * so there is NO float and NO sqrt anywhere in the iteration, and
    * the fixpoint is bit-identical across engines by construction.
    * Magnitude ledger (sf0.1): Σq_aq_b ≤ 5·10¹⁵, clamped ≤ 5·10⁹,
    * mat-vec ≤ 64·5·10⁹·10³ = 3.2·10¹⁴, ·10³ rescale ≤ 3.2·10¹⁷ —
    * every intermediate int64-exact with ANSI overflow as the loud
    * guard. Start vector all-ones ⇒ the sign convention is
    * deterministic.
    *
    * Scale shape: the scatter build is one self-join on vec_id (dim²
    * fan-out per vector, partial-aggregated map-side to the 64×64
    * frame); each iteration is a broadcast-scale join on the
    * dims-sized frame. At 10⁹ vectors only the first pass grows —
    * the iteration cost is O(dim²) regardless of corpus.
    */
  def embeddingTopEigen(spark: SparkSession, dir: String): DataFrame =
    embeddingTopEigen(spark, dir, forceDistributed = false)

  /** `forceDistributed` pins the distributed-iteration branch for the
    * branch-equality test.
    */
  private[graft] def embeddingTopEigen(spark: SparkSession, dir: String,
      forceDistributed: Boolean): DataFrame = {
    val ex = Tables(spark, dir).embeddings
      .select(col("vec_id"),
        posexplode(transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6)).cast("long")))
          .as(Seq("dim", "v")))
    val cm = ex.toDF("vec_id", "da", "va")
      .join(ex.toDF("vec_id", "db", "vb"), "vec_id")
      .groupBy(col("da"), col("db"))
      .agg(sum(col("va") * col("vb")).as("s"))
      .select(col("da"), col("db"),
        expr(signedDivSpark("s", CScaleDiv.toString)).as("cab"))
      .cache() // read once per iteration
    graft.core.OwnedCaches.own(cm)
    // replay admission (round 14, VERDICT r13 #2): cm is dim² rows BY
    // CONSTRUCTION (64×64 here — corpus size only affects the scatter
    // build above, which stays distributed), yet the unrolled
    // DataFrame power iteration re-references each round's w twice
    // (mat-vec + its own max), so three rounds cost ~4.7 s of plan +
    // stage latency against ~1 ms of integer arithmetic (profiled at
    // sf0.1: scatter build 1.3 s, loop 4.7 s). Same measured-cost
    // admission as the graph family: under the cap the iteration runs
    // in one task over the cached scatter frame with the identical
    // exact-int64 ops (Math.*Exact mirrors ANSI's loud overflow);
    // above it (never for a real embedding width, but honest), the
    // distributed loop below is unchanged.
    val nCm = cm.count() // also materializes the owned cache
    if (!forceDistributed &&
        nCm <= graft.operators.Graph.replayCap(EigenPerRowUs, EigenIters)) {
      val sess = spark
      import sess.implicits._
      val iters = EigenIters; val vs = VScale
      return cm.select(col("da").cast("long"), col("db").cast("long"),
          col("cab").cast("long"))
        .as[(Long, Long, Long)]
        .repartition(1)
        .mapPartitions(it => eigenReplay(it.toArray, iters, vs))
        .toDF("dim", "vv")
        // dim is posexplode's INT in the distributed branch — match it
        .select(col("dim").cast("int").as("dim"), col("vv").as("loading_q3"),
          expr(s"CAST(vv AS DOUBLE) / CAST($VScale AS DOUBLE)").as("loading"))
        .orderBy("dim")
    }
    var v = cm.select(col("db").as("dim")).distinct()
      .withColumn("vv", lit(VScale))
    for (_ <- 1 to EigenIters) {
      val w = cm.join(v.toDF("db", "vv"), "db")
        .groupBy(col("da").as("dim"))
        .agg(sum(col("cab") * col("vv")).as("w"))
      // max(|w|) floored at 1 (ADVICE r14): a degenerate input where
      // every w sums to zero otherwise divides by zero — NULLs here,
      // ArithmeticException in the replay. Flooring renorms the
      // all-zero vector to itself on all three faces (this loop, the
      // replay, the oracle); any real input has m ≥ 1 and is unchanged.
      val m = w.agg(greatest(max(abs(col("w"))), lit(1L)).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("dim"),
          expr(signedDivSpark(s"w * $VScale", "m")).as("vv"))
    }
    v.select(col("dim"), col("vv").as("loading_q3"),
        expr(s"CAST(vv AS DOUBLE) / CAST($VScale AS DOUBLE)").as("loading"))
      .orderBy("dim")
  }

  /** The single-task power-iteration replay body — bit-identical to
    * the distributed loop: v₀ ≡ VScale on the distinct db key set,
    * each round wₐ = Σ_b cab·vv_b over the present (a,b) rows (exact
    * int64 sums, order-invariant), renorm vvₐ = (wₐ·VScale) toward-zero
    * divided by max|w| (Java long division truncates toward zero ==
    * the engines' sign-split div). Math.*Exact so an out-of-ledger
    * input throws like ANSI instead of wrapping. Factored out for
    * ReplayCalibrate (measured ~0.04-0.08 µs/row·iter on a dense grid).
    */
  private[graft] def eigenReplay(rows: Array[(Long, Long, Long)],
      iters: Int, vscale: Long): Iterator[(Long, Long)] = {
    var v = scala.collection.mutable.LongMap.empty[Long]
    rows.foreach { case (_, db, _) => v.update(db, vscale) }
    for (_ <- 1 to iters) {
      val w = scala.collection.mutable.LongMap.empty[Long]
      rows.foreach { case (da, db, cab) =>
        v.get(db).foreach { vv =>
          w.update(da, Math.addExact(w.getOrElse(da, 0L), Math.multiplyExact(cab, vv)))
        }
      }
      var m = 1L // floor 1, mirroring the distributed greatest(max|w|, 1)
      w.foreachValue { x => val a = math.abs(x); if (a > m) m = a }
      val next = scala.collection.mutable.LongMap.empty[Long]
      w.foreach { case (da, wv) => next.update(da, Math.multiplyExact(wv, vscale) / m) }
      v = next
    }
    v.toSeq.sortBy(_._1).iterator
  }

  val embeddingTopEigenSql: String = {
    def iter(prev: String, name: String): String =
      s"""${name}_w AS (
         |  SELECT c.da AS dim, CAST(sum(c.cab * p.vv) AS BIGINT) AS w
         |  FROM cm c JOIN $prev p ON p.dim = c.db GROUP BY 1),
         |${name}_m AS (SELECT greatest(max(abs(w)), 1) AS m FROM ${name}_w),
         |$name AS (
         |  SELECT dim, CAST(${signedDivDuck(s"w * $VScale", "m")} AS BIGINT) AS vv
         |  FROM ${name}_w, ${name}_m)""".stripMargin
    val iters = (1 to EigenIters).map(k => iter(s"v${k - 1}", s"v$k")).mkString(",\n")
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS v
       |  FROM embeddings),
       |cm AS MATERIALIZED (
       |  SELECT a.dim AS da, b.dim AS db,
       |    CAST(${signedDivDuck("sum(a.v * b.v)", CScaleDiv.toString)} AS BIGINT) AS cab
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT db AS dim, CAST($VScale AS BIGINT) AS vv FROM cm),
       |$iters
       |SELECT dim, vv AS loading_q3,
       |  CAST(vv AS DOUBLE) / CAST($VScale AS DOUBLE) AS loading
       |FROM v$EigenIters ORDER BY dim""".stripMargin
  }

  // ----------------------------------------------------------- ann_recall_eval

  /** Recall@k of the LSH retriever against the exact brute-force
    * ground truth, per query — the eval loop every ANN deployment
    * runs before trusting its index (pair with `hybrid_rank_fusion`,
    * which consumes both retrievers; this measures one against the
    * other). Hit counts are exact integers (set intersection of the
    * two id-ranked top-k lists); recall is one division.
    *
    * Scale shape: both inputs are already per-query top-k frames
    * (≤ queries·k rows), so the equi-join and rollup are trivially
    * bounded — eval cost never scales with the corpus, only with the
    * query sample.
    */
  def annRecallEval(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkBruteforce(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = annLshTopk(spark, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    exact.join(lsh, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("k"), col("hits"),
        expr("CAST(hits AS DOUBLE) / CAST(k AS DOUBLE)").as("recall"))
      .orderBy("query_id")
  }

  // ---------------------------------------------------------- embedding_outliers

  private val OutlierTopK = 3

  /** Per-label embedding outliers: the [[OutlierTopK]] vectors
    * farthest from their label centroid — the mislabel/contamination
    * probe run before trusting `embedding_centroids` as class
    * prototypes (a far outlier is a wrong label or a polluted
    * embedding). Centroids are the kmeans-update convention
    * (floor-div per-dim means on the micro-unit grid), so every
    * distance² is an EXACT integer and the ranking carries no float
    * at all — fully deterministic across engines.
    *
    * Scale shape: the (label, dim) centroid aggregate is
    * domain-bounded (labels × dims rows); per-vector distances
    * partial-agg locally (posexplode keeps a vector's dims in one
    * task, so the vec_id shuffle carries one row per vector); the
    * rank window partitions by label.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"),
        posexplode(transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6)))).as(Seq("dim", "v")))
    val cent = ex.groupBy(col("label"), col("dim"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("c"))
    val dist = ex.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(expr("CAST((v - c) * (v - c) AS BIGINT)")).as("dist2"))
    val w = Window.partitionBy("label").orderBy(col("dist2").desc, col("vec_id"))
    dist.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= OutlierTopK)
      .select(col("label"), col("vec_id"), col("dist2"), col("rank"))
      .orderBy("label", "rank")
  }

  val embeddingOutliersSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, label,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
       |    floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS v
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, dim, floor(CAST(sum(v) AS DOUBLE) / count(*)) AS c
       |  FROM ex GROUP BY 1, 2),
       |d AS (
       |  SELECT ex.vec_id, ex.label,
       |    CAST(sum((ex.v - cent.c) * (ex.v - cent.c)) AS BIGINT) AS dist2
       |  FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT label, vec_id, dist2,
       |    row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rank
       |  FROM d)
       |SELECT label, vec_id, dist2, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $OutlierTopK
       |ORDER BY label, rank""".stripMargin

  // ------------------------------------------------------------ ann_ivfpq_topk

  /** IVF+PQ composed retriever — the production index shape (FAISS
    * IVFPQ): IVF probing bounds WHICH vectors are considered
    * (nprobe = [[NProbe]] cells, candidate volume n·nprobe/nlist),
    * then the PQ/ADC pass scores those candidates from 8 small codes
    * each — no raw vectors touched — and shortlists [[Shortlist]]
    * per query for the exact re-rank. Composes the two cost bounds
    * the standalone retrievers demonstrate separately: IVF bounds
    * the scan set, PQ bounds the bytes per scanned vector. At 100 TB
    * this is the difference between reading 64 floats × n/nlist·
    * nprobe and reading 8 bytes for the same set.
    *
    * Everything is micro-unit integer arithmetic (the IVF cell
    * ranking and ADC distances are exact sub-2^53 integers), so the
    * full composition is bit-reproducible in the DuckDB oracle.
    */
  def annIvfPqTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val cand = ivfCandidates(spark, dir, NProbe)
    val sd = pqDistTables(spark, dir)
    val wEnc = Window.partitionBy("vec_id", "sub").orderBy(col("dist"), col("clabel"))
    val code = sd.withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("sub"),
        col("clabel").as("code_lbl"))
    val qt = sd.filter(col("vec_id") < NumQueries)
      .toDF("q_query", "q_sub", "q_clabel", "q_dist")
    val adc = cand
      .join(code, "neighbor_id")
      .join(broadcast(qt),
        col("q_query") === col("query_id") && col("q_sub") === col("sub") &&
          col("q_clabel") === col("code_lbl"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("q_dist")).as("dist"))
    val wAdc = Window.partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))
    val shortlist = adc.withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= Shortlist)
      .select(col("query_id"), col("neighbor_id"))
    rerankQ6TopK(spark, dir, shortlist)
  }

  lazy val annIvfPqTopkSql: String =
    s"""WITH ex AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS MATERIALIZED (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |cy AS (SELECT label, sqrt(CAST(sum(cv*cv) AS DOUBLE)) AS cnorm FROM cent GROUP BY label),
       |scores AS (
       |  SELECT e.vec_id, c.label AS cell,
       |         CAST(sum(e.qv * c.cv) AS DOUBLE) / any_value(cy.cnorm) AS score
       |  FROM ex e JOIN cent c ON c.d = e.d JOIN cy ON cy.label = c.label
       |  GROUP BY e.vec_id, c.label),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS cell_rank
       |  FROM scores),
       |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE cell_rank = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE cell_rank <= $NProbe AND vec_id < $NumQueries),
       |cand AS MATERIALIZED (SELECT DISTINCT p.query_id, a.neighbor_id
       |       FROM probes p JOIN assigned a ON a.cell = p.cell WHERE a.neighbor_id != p.query_id),
       |sd AS MATERIALIZED (
       |  SELECT e.vec_id, e.d // $NSub AS sub, c.label AS clabel,
       |         sum((e.qv - c.cv) * (e.qv - c.cv)) AS dist
       |  FROM ex e JOIN cent c ON c.d = e.d
       |  GROUP BY 1, 2, 3),
       |code AS (
       |  SELECT vec_id AS neighbor_id, sub, clabel AS code_lbl
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) AS rn FROM sd)
       |  WHERE rn = 1),
       |adc AS (
       |  SELECT cand.query_id, cand.neighbor_id, sum(q.dist) AS dist
       |  FROM cand
       |    JOIN code ON code.neighbor_id = cand.neighbor_id
       |    JOIN sd q ON q.vec_id = cand.query_id AND q.sub = code.sub AND q.clabel = code.code_lbl
       |  GROUP BY 1, 2),
       |sl AS (SELECT query_id, neighbor_id
       |       FROM (SELECT query_id, neighbor_id,
       |               row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS srk
       |             FROM adc)
       |       WHERE srk <= $Shortlist),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |sims AS (SELECT s.query_id, s.neighbor_id,
       |           CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
       |         FROM sl s
       |           JOIN ex a ON a.vec_id = s.query_id
       |           JOIN ex b ON b.vec_id = s.neighbor_id AND b.d = a.d
       |           JOIN nrm na ON na.vec_id = s.query_id
       |           JOIN nrm nb ON nb.vec_id = s.neighbor_id
       |         GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM sims)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------- hard_negative_pairs

  private val HardNegK = 3

  /** Hard-negative mining for contrastive training: per query
    * vector, the [[HardNegK]] most-similar vectors carrying a
    * DIFFERENT label — the near-miss examples a two-tower /
    * embedding model learns the most from (random negatives are
    * trivially separable; these sit at the decision boundary).
    * Candidates come from the IVF probe join (the `ann_ivf_topk`
    * bound — mining cost is the candidate volume, never corpus²);
    * the label inequality lives IN the join, so scoring happens only
    * on cross-label pairs (filter-then-score, the
    * `ann_filtered_topk` discipline inverted). Quantized-cosine
    * scores keep the ranking bit-reproducible.
    */
  def hardNegativePairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val labels = e.select(col("vec_id"), col("label"))
    val cand = ivfCandidates(spark, dir, NProbe)
      .join(labels.toDF("query_id", "q_label"), "query_id")
      .join(labels.toDF("neighbor_id", "c_label"), "neighbor_id")
      .filter(col("q_label") =!= col("c_label"))
      .select(col("query_id"), col("neighbor_id"), col("c_label"))
    val q6 = withQ6Norm(e, "uid", "u", "nrm")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .join(broadcast(q6.toDF("query_id", "q_emb", "q_n")), "query_id")
      .join(q6.toDF("neighbor_id", "c_emb", "c_n"), "neighbor_id")
      .withColumn("sim", unitDot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HardNegK)
      .select(col("query_id"), col("neighbor_id"),
        col("c_label").as("negative_label"), col("rank"))
      .orderBy("query_id", "rank")
  }

  lazy val hardNegativePairsSql: String =
    s"""WITH ex AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |cy AS (SELECT label, sqrt(CAST(sum(cv*cv) AS DOUBLE)) AS cnorm FROM cent GROUP BY label),
       |scores AS (
       |  SELECT e.vec_id, c.label AS cell,
       |         CAST(sum(e.qv * c.cv) AS DOUBLE) / any_value(cy.cnorm) AS score
       |  FROM ex e JOIN cent c ON c.d = e.d JOIN cy ON cy.label = c.label
       |  GROUP BY e.vec_id, c.label),
       |ranked AS (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS cell_rank
       |  FROM scores),
       |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE cell_rank = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE cell_rank <= $NProbe AND vec_id < $NumQueries),
       |lv AS (SELECT vec_id, label FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.neighbor_id, lc.label AS c_label
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  JOIN lv lq ON lq.vec_id = p.query_id
       |  JOIN lv lc ON lc.vec_id = a.neighbor_id
       |  WHERE a.neighbor_id != p.query_id AND lq.label != lc.label),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |sims AS (SELECT c.query_id, c.neighbor_id, any_value(c.c_label) AS c_label,
       |           CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
       |         FROM cand c
       |           JOIN ex a ON a.vec_id = c.query_id
       |           JOIN ex b ON b.vec_id = c.neighbor_id AND b.d = a.d
       |           JOIN nrm na ON na.vec_id = c.query_id
       |           JOIN nrm nb ON nb.vec_id = c.neighbor_id
       |         GROUP BY c.query_id, c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, c_label,
       |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |      FROM sims)
       |SELECT query_id, neighbor_id, c_label AS negative_label,
       |  CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $HardNegK
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------- ann_frontier_eval

  /** Recall/cost frontier across the three candidate-bounding
    * retriever families — LSH (8 tables), IVF at nprobe ∈ {1, 3, 5},
    * PQ/ADC (shortlist 50) — each scored as recall@K against the
    * exact brute-force truth AND costed as its candidate-set size
    * (the number of vectors that must be exactly re-ranked; at
    * corpus scale that IS the query cost). One row per retriever ×
    * cost point: the committed artifact every index-tuning decision
    * reads ("how much recall does the next probe buy"). Candidate
    * sets are supersets as nprobe grows, and the exact re-rank makes
    * recall MONOTONE in the candidate set (any candidate outscoring
    * a true top-K member would itself be true top-K) — pinned in
    * Round12Spec.
    *
    * Scale shape: each candidate frame is the retriever's own
    * bounded equi-join output (≤ queries × occupancy rows); the eval
    * adds only count aggregates and a ≤ queries·K intersection join —
    * cost never scales with the corpus, only with the query sample.
    */
  def annFrontierEval(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val bf = annTopkBruteforce(spark, dir)
      .select(col("query_id"), col("neighbor_id")).cache()
    graft.core.OwnedCaches.own(bf)
    // ONE tagged union instead of five independent rerank+eval chains
    // (optimization round 18: the per-retriever chain cost ~80
    // scheduled jobs — 5 × (rerank window + three cross-joined scalar
    // aggregates, with the truth count recomputed every arm)). The
    // candidate frames are unchanged; the exact re-rank runs once
    // with the window partitioned by (retriever, query), the
    // per-retriever counts fold out of two grouped aggregates, and
    // the truth count is computed once. Per-retriever rows carry the
    // identical six values (same sim expression, same tie-breaks,
    // candidate counts over the same frames).
    def tag(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("retriever"), col("query_id"), col("neighbor_id"))
    val cands = graft.core.OwnedCaches.own(
      tag("ivf_np1", ivfCandidates(spark, dir, 1))
        .unionByName(tag("ivf_np3", ivfCandidates(spark, dir, 3)))
        .unionByName(tag("ivf_np5", ivfCandidates(spark, dir, 5)))
        .unionByName(tag("lsh_t8", lshCandidates(spark, dir)))
        .unionByName(tag("pq_sl50", pqShortlist(spark, dir)))
        .cache())
    val e = Tables(spark, dir).embeddings
    val q6 = withQ6Norm(e, "uid", "u", "nrm")
    val w = Window.partitionBy("retriever", "query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    val top = cands
      .join(broadcast(q6.toDF("query_id", "q_emb", "q_n")), "query_id")
      .join(q6.toDF("neighbor_id", "c_emb", "c_n"), "neighbor_id")
      .withColumn("sim", unitDot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("retriever"), col("query_id"), col("neighbor_id"))
    // |top_r ∩ bf| — equal in either semi direction on distinct pair
    // sets; the tagged side keeps the retriever key
    val hits = top.join(bf, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("retriever")).agg(count(lit(1)).as("hits"))
    val nc = cands.groupBy(col("retriever")).agg(count(lit(1)).as("n_cand"))
    val truth = bf.agg(count(lit(1)).as("n_truth"))
    // literal retriever spine: an arm with zero candidates must still
    // emit its row (n_cand = hits = 0), exactly as the old per-arm
    // scalar aggregates did
    val spine = spark.range(1).select(explode(array(
      lit("ivf_np1"), lit("ivf_np3"), lit("ivf_np5"),
      lit("lsh_t8"), lit("pq_sl50"))).as("retriever"))
    spine
      .join(nc, Seq("retriever"), "left")
      .join(hits, Seq("retriever"), "left")
      .crossJoin(broadcast(truth))
      .select(col("retriever"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        expr(s"CAST(coalesce(n_cand, 0) AS DOUBLE) / CAST($NumQueries AS DOUBLE)")
          .as("avg_candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("n_truth"),
        expr("CAST(coalesce(hits, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE)").as("recall_at_k"))
      .orderBy("retriever")
  }

  lazy val annFrontierEvalSql: String = {
    import graft.functions.RademacherSketch.{NumTables, PlanesPerTable, Dim}
    def rerank(cand: String, tag: String): String =
      s"""sims_$tag AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
         |  FROM $cand c
         |    JOIN ex a ON a.vec_id = c.query_id
         |    JOIN ex b ON b.vec_id = c.neighbor_id AND b.d = a.d
         |    JOIN nrm na ON na.vec_id = c.query_id
         |    JOIN nrm nb ON nb.vec_id = c.neighbor_id
         |  GROUP BY 1, 2),
         |top_$tag AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |    FROM sims_$tag) WHERE rank <= $K),
         |row_$tag AS (
         |  SELECT '$tag' AS retriever, nc.n_cand,
         |    CAST(nc.n_cand AS DOUBLE) / CAST($NumQueries AS DOUBLE) AS avg_candidates,
         |    h.hits, t.n_truth,
         |    CAST(h.hits AS DOUBLE) / CAST(t.n_truth AS DOUBLE) AS recall_at_k
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM $cand) nc,
         |       (SELECT CAST(count(*) AS BIGINT) AS hits
         |        FROM bf JOIN top_$tag USING (query_id, neighbor_id)) h,
         |       (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM bf) t)""".stripMargin
    def ivfCand(np: Int): String =
      s"""probes_np$np AS (SELECT vec_id AS query_id, cell FROM ranked
         |  WHERE cell_rank <= $np AND vec_id < $NumQueries),
         |cand_ivf_np$np AS (
         |  SELECT DISTINCT p.query_id, a.neighbor_id
         |  FROM probes_np$np p JOIN assigned a ON a.cell = p.cell
         |  WHERE a.neighbor_id != p.query_id)""".stripMargin
    s"""WITH ex AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |nrm AS MATERIALIZED (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM ($annTopkBruteforceSql)),
       |cent AS MATERIALIZED (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |cy AS (SELECT label, sqrt(CAST(sum(cv*cv) AS DOUBLE)) AS cnorm FROM cent GROUP BY label),
       |scores AS (
       |  SELECT e.vec_id, c.label AS cell,
       |         CAST(sum(e.qv * c.cv) AS DOUBLE) / any_value(cy.cnorm) AS score
       |  FROM ex e JOIN cent c ON c.d = e.d JOIN cy ON cy.label = c.label
       |  GROUP BY e.vec_id, c.label),
       |ranked AS MATERIALIZED (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS cell_rank
       |  FROM scores),
       |assigned AS MATERIALIZED (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE cell_rank = 1),
       |${ivfCand(1)},
       |${ivfCand(3)},
       |${ivfCand(5)},
       |grid AS (SELECT t, p, d,
       |    CASE WHEN ('0x'||substr(md5(CAST(t AS VARCHAR)||'_'||CAST(p AS VARCHAR)||'_'||CAST(d AS VARCHAR)),1,1))::BIGINT & 1 = 1 THEN 1 ELSE -1 END AS w
       |  FROM (SELECT unnest(range($NumTables)) AS t) a,
       |       (SELECT unnest(range($PlanesPerTable)) AS p) b,
       |       (SELECT unnest(range($Dim)) AS d) c),
       |dots AS (SELECT e.vec_id, g.t, g.p, sum(g.w * e.qv) AS s
       |         FROM ex e JOIN grid g ON g.d = e.d GROUP BY 1, 2, 3),
       |buckets AS (SELECT vec_id, t, sum(CASE WHEN s > 0 THEN (1::BIGINT<<p) ELSE 0 END) AS bucket
       |            FROM dots GROUP BY 1, 2),
       |cand_lsh AS MATERIALIZED (
       |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
       |  FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket
       |  WHERE qb.vec_id < $NumQueries AND qb.vec_id != cb.vec_id),
       |sd AS MATERIALIZED (
       |  SELECT e.vec_id, e.d // $NSub AS sub, c.label AS clabel,
       |         sum((e.qv - c.cv) * (e.qv - c.cv)) AS dist
       |  FROM ex e JOIN cent c ON c.d = e.d
       |  GROUP BY 1, 2, 3),
       |code AS (
       |  SELECT vec_id, sub, clabel AS code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) AS rn FROM sd)
       |  WHERE rn = 1),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.dist) AS dist
       |  FROM code c JOIN sd q ON q.sub = c.sub AND q.clabel = c.code
       |  WHERE q.vec_id < $NumQueries AND q.vec_id != c.vec_id
       |  GROUP BY 1, 2),
       |cand_pq AS MATERIALIZED (
       |  SELECT query_id, neighbor_id
       |  FROM (SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS srk
       |        FROM adc)
       |  WHERE srk <= $Shortlist),
       |${rerank("cand_ivf_np1", "ivf_np1")},
       |${rerank("cand_ivf_np3", "ivf_np3")},
       |${rerank("cand_ivf_np5", "ivf_np5")},
       |${rerank("cand_lsh", "lsh_t8")},
       |${rerank("cand_pq", "pq_sl50")}
       |SELECT * FROM row_ivf_np1
       |UNION ALL SELECT * FROM row_ivf_np3
       |UNION ALL SELECT * FROM row_ivf_np5
       |UNION ALL SELECT * FROM row_lsh_t8
       |UNION ALL SELECT * FROM row_pq_sl50
       |ORDER BY retriever""".stripMargin
  }

  // lazy: interpolates annLshTopkSql via the same convention as
  // hybridRankFusionSql (declared-later interpolation).
  lazy val annRecallEvalSql: String =
    s"""WITH bf AS ($annTopkBruteforceSql),
       |lshr AS ($annLshTopkSql),
       |j AS (
       |  SELECT bf.query_id,
       |    CASE WHEN l.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM bf LEFT JOIN lshr l
       |    ON bf.query_id = l.query_id AND bf.neighbor_id = l.neighbor_id)
       |SELECT query_id, CAST(count(*) AS BIGINT) AS k,
       |  CAST(sum(hit) AS BIGINT) AS hits,
       |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM j GROUP BY query_id
       |ORDER BY query_id""".stripMargin

  // ------------------------------------------------------ embedding_norm_profile

  /** Embedding norm health profile per label — the first thing to
    * chart when an embedding feed degrades (collapsed encoders emit
    * near-zero norms; un-normalized mixes show bimodal norms):
    * count, min/max/median/mean of the SQUARED L2 norm on the
    * milli-unit integer grid (⌊v·10³⌋ keeps every squared norm an
    * exact sub-2^53 integer, so min/max/median are integer order
    * statistics and the mean is one exact division — no float sum
    * anywhere, the parity ledger's safe zone; a variance column
    * would need Σ(norm²)² ≫ 2^53 and is deliberately left out).
    * Median = explicit (min+max)/2 middle order statistics, the
    * `embedding_median_centroid` convention.
    *
    * Scale shape: map-only per-vector norm (one row per vector into
    * the shuffle), label-grain aggregate + rank window on the
    * per-label frame.
    */
  def embeddingNormProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    // the squared norm is the codegen'd DotProduct of the quantized
    // vector with itself — exact integer arithmetic in double space
    // (each term < 2^53), never an interpreted lambda in the hot path
    val n2 = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"),
        expr("CAST(graft_dot(transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS DOUBLE)), " +
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS DOUBLE))) AS BIGINT)").as("n2"))
    val r = n2
      .withColumn("rn", row_number().over(
        Window.partitionBy("label").orderBy(col("n2"), col("vec_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("label")))
    val med = r
      .filter(expr("rn >= CAST(floor((cnt + 1) / 2.0) AS BIGINT) AND rn <= CAST(floor(cnt / 2.0) AS BIGINT) + 1"))
      .groupBy(col("label"))
      .agg(expr("CAST(min(n2) + max(n2) AS DOUBLE) / CAST(2 AS DOUBLE)").as("median_norm2"))
    n2.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("n2")).as("min_norm2"), max(col("n2")).as("max_norm2"),
        sum(col("n2")).as("s"))
      .join(med, "label")
      .select(col("label"), col("n_vectors"), col("min_norm2"),
        col("max_norm2"), col("median_norm2"),
        expr("CAST(s AS DOUBLE) / CAST(n_vectors AS DOUBLE)").as("mean_norm2"))
      .orderBy("label")
  }

  val embeddingNormProfileSql: String =
    """WITH n2 AS (
      |  SELECT vec_id, label,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      [CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT) for v in embedding]),
      |      (a, x) -> a + x * x) AS BIGINT) AS n2
      |  FROM embeddings),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY label ORDER BY n2, vec_id) AS rn,
      |    count(*) OVER (PARTITION BY label) AS cnt
      |  FROM n2),
      |med AS (
      |  SELECT label, CAST(min(n2) + max(n2) AS DOUBLE) / CAST(2 AS DOUBLE) AS median_norm2
      |  FROM r
      |  WHERE rn >= CAST(floor((cnt + 1) / 2.0) AS BIGINT)
      |    AND rn <= CAST(floor(cnt / 2.0) AS BIGINT) + 1
      |  GROUP BY label)
      |SELECT n2.label AS label, CAST(count(*) AS BIGINT) AS n_vectors,
      |  CAST(min(n2) AS BIGINT) AS min_norm2, CAST(max(n2) AS BIGINT) AS max_norm2,
      |  any_value(med.median_norm2) AS median_norm2,
      |  CAST(sum(n2) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_norm2
      |FROM n2 JOIN med ON med.label = n2.label
      |GROUP BY n2.label ORDER BY label""".stripMargin

  // ------------------------------------------------- matryoshka_recall_eval

  private val MatryoshkaDims = Seq(8, 16, 32, 64)

  /** Matryoshka-style truncation eval: recall@[[K]] of retrieval on
    * PREFIX dimensions (8/16/32 of 64) against the full-dimension
    * ranking — the measurement behind MRL-trained embeddings, where
    * serving cost drops linearly with kept dims IF short-prefix
    * rankings stay faithful. The 100 TB decision this artifact
    * drives: a 8× cheaper scan (8 of 64 dims) is free capacity when
    * recall holds and silent quality loss when it doesn't —
    * complementing `ann_frontier_eval`, which sweeps CANDIDATE cost
    * at fixed dimensionality while this sweeps the similarity's own
    * resolution. All rankings run on the micro-unit grid (⌊v·10⁶⌋ —
    * exact sub-2^53 integer dots, the [[withQ6Norm]] argument), so
    * every top-k set and therefore every hit count is
    * bit-reproducible; the d = 64 arm doubles as a self-check (hits
    * = k·queries by construction).
    *
    * Scale shape: per arm, the broadcast-queries map-only scan of
    * `ann_topk_bruteforce` over sliced arrays — 4 arms, no pair
    * blow-up; at corpus scale each arm composes with IVF/LSH
    * candidate bounding unchanged.
    */
  def matryoshkaRecallEval(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    def topAtDim(d: Int): DataFrame = {
      val q6 = expr(
        s"transform(slice(embedding, 1, $d), v -> CAST(floor(CAST(v AS DOUBLE) * 1e6) AS DOUBLE))")
      val vecs = e.select(col("vec_id"), q6.as("u"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("u"), col("u"))))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      vecs.toDF("neighbor_id", "c_emb", "c_n")
        .join(broadcast(vecs.toDF("query_id", "q_emb", "q_n")
          .filter(col("query_id") < NumQueries)),
          col("query_id") =!= col("neighbor_id"))
        .withColumn("sim",
          unitDot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"))
    }
    val full = topAtDim(MatryoshkaDims.max)
    val arms = MatryoshkaDims.map { d =>
      full.join(topAtDim(d).withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(countDistinct(col("query_id")).as("n_queries"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .selectExpr(s"CAST($d AS INTEGER) AS trunc_dim",
          "CAST(n_queries AS BIGINT) AS n_queries",
          "CAST(hits AS BIGINT) AS hits",
          s"CAST(hits AS DOUBLE) / CAST(n_queries * $K AS DOUBLE) AS recall_at_$K")
    }
    arms.reduce(_.unionAll(_)).orderBy("trunc_dim")
  }

  lazy val matryoshkaRecallEvalSql: String = {
    def rankCte(d: Int, name: String): String =
      s"""nrm_$name AS (
         |  SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm
         |  FROM ex WHERE d < $d GROUP BY 1),
         |sims_$name AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS sim
         |  FROM ex a
         |  JOIN ex b ON b.d = a.d AND a.d < $d AND b.vec_id != a.vec_id
         |  JOIN nrm_$name na ON na.vec_id = a.vec_id
         |  JOIN nrm_$name nb ON nb.vec_id = b.vec_id
         |  WHERE a.vec_id < $NumQueries
         |  GROUP BY 1, 2),
         |top_$name AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |    FROM sims_$name) r0 WHERE rank <= $K)""".stripMargin
    val arms = MatryoshkaDims.map { d =>
      s"""SELECT CAST($d AS INTEGER) AS trunc_dim,
         |  CAST(count(DISTINCT f.query_id) AS BIGINT) AS n_queries,
         |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(DISTINCT f.query_id) * $K AS DOUBLE) AS recall_at_$K
         |FROM top_d64 f LEFT JOIN top_d$d t
         |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |    floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS qv
       |  FROM embeddings),
       |${MatryoshkaDims.map(d => rankCte(d, s"d$d")).mkString(",\n")}
       |$arms
       |ORDER BY trunc_dim""".stripMargin
  }

  // ----------------------------------------------- label_separation_profile

  /** Per-label cluster-quality profile: mean squared distance to the
    * OWN label centroid (compactness) vs the nearest OTHER centroid's
    * squared distance (separation), and their ratio — the
    * silhouette-shaped read at LABEL grain that says whether labels
    * are geometrically meaningful before anything trains on them
    * (`knn_confusion` finds which labels bleed; this says how much
    * margin each label has). Centroids are the kmeans-update integer
    * convention; every distance is an exact integer (per-vector d² ≲
    * 10¹², label sums ≲ 10¹⁵ at driver SFs — inside the 2^53 cast
    * bound, asserted in the spec), so the two means and the ratio
    * are plain exact-operand divisions.
    *
    * Scale shape: the (label, dim) centroid aggregate is
    * domain-bounded; per-vector distances partial-agg locally; the
    * centroid-pair frame is labels² — bounded. One corpus-width
    * shuffle total (the vec-grain reduce).
    */
  def labelSeparationProfile(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"),
        posexplode(transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6)))).as(Seq("dim", "v")))
    val cent = ex.groupBy(col("label"), col("dim"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("c"))
    val intra = ex.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(expr("CAST((v - c) * (v - c) AS BIGINT)")).as("d2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd2"))
    val inter = cent.toDF("la", "dim", "ca")
      .join(cent.toDF("lb", "dim", "cb"), "dim")
      .filter(col("la") =!= col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(expr("CAST((ca - cb) * (ca - cb) AS BIGINT)")).as("cd2"))
      .groupBy(col("la")).agg(min(col("cd2")).as("min_inter"))
    intra.join(inter, col("label") === col("la"))
      .selectExpr("label", "CAST(n AS BIGINT) AS n_vectors",
        "CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_intra_d2",
        "CAST(min_inter AS BIGINT) AS min_inter_d2",
        "CAST(min_inter AS DOUBLE) / (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)) AS separation_ratio")
      .orderBy("label")
  }

  val labelSeparationProfileSql: String =
    """WITH ex AS (
      |  SELECT vec_id, label,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
      |    floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS v
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, dim, floor(CAST(sum(v) AS DOUBLE) / count(*)) AS c
      |  FROM ex GROUP BY 1, 2),
      |d AS (
      |  SELECT ex.vec_id, ex.label,
      |    CAST(sum((ex.v - cent.c) * (ex.v - cent.c)) AS BIGINT) AS d2
      |  FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim
      |  GROUP BY 1, 2),
      |intra AS (
      |  SELECT label, CAST(count(*) AS BIGINT) AS n, CAST(sum(d2) AS BIGINT) AS sd2
      |  FROM d GROUP BY 1),
      |cp AS (
      |  SELECT a.label AS la, b.label AS lb,
      |    CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS cd2
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label != b.label
      |  GROUP BY 1, 2),
      |inter AS (SELECT la, CAST(min(cd2) AS BIGINT) AS min_inter FROM cp GROUP BY 1)
      |SELECT label, n AS n_vectors,
      |  CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_intra_d2,
      |  min_inter AS min_inter_d2,
      |  CAST(min_inter AS DOUBLE) / (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)) AS separation_ratio
      |FROM intra JOIN inter ON inter.la = intra.label
      |ORDER BY label""".stripMargin

  // --------------------------------------------------------- knn_confusion

  /** Corpus-wide kNN label confusion matrix: every vector classified
    * by majority vote of its [[KnnK]] graph neighbors (the
    * `knn_graph` edges — candidate-bounded, never all-pairs), tallied
    * into (actual, predicted) cells with per-actual-row shares. Where
    * `knn_classify` scores 10 held-out queries and `cluster_purity`
    * scores unsupervised cells, this is the full-corpus
    * label-noise/mislabel screen — the matrix a curation pass reads
    * to find which label PAIRS bleed into each other before trusting
    * labels as training targets. Votes and cells are exact integer
    * counts; ties break to the smaller label on both engines.
    *
    * Scale shape: inherits the knn_graph plan (broadcast centroids,
    * cell-bounded pair join, corpus-scaled k), then two label-grain
    * aggregates over the k·n edge frame.
    */
  def knnConfusion(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings.select(col("vec_id"), col("label"))
    val votes = knnGraph(spark, dir)
      .join(e.toDF("neighbor_id", "nl"), "neighbor_id")
      .groupBy(col("vec_id"), col("nl")).agg(count(lit(1)).as("votes"))
    val pred = votes.withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("votes").desc, col("nl"))))
      .filter(col("rn") === 1)
    pred.join(e.toDF("vec_id", "actual"), "vec_id")
      .groupBy(col("actual").as("actual_label"), col("nl").as("predicted_label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy("actual_label")))
      .selectExpr("actual_label", "predicted_label", "CAST(n AS BIGINT) AS n",
        "CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS row_share")
      .orderBy("actual_label", "predicted_label")
  }

  lazy val knnConfusionSql: String =
    s"""WITH kg AS ($knnGraphSql),
       |votes AS (
       |  SELECT kg.vec_id, e.label AS nl, count(*) AS votes
       |  FROM kg JOIN embeddings e ON e.vec_id = kg.neighbor_id
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT vec_id, nl FROM (
       |    SELECT vec_id, nl,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, nl) AS rn
       |    FROM votes) r0 WHERE rn = 1),
       |cells AS (
       |  SELECT q.label AS actual_label, p.nl AS predicted_label,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM pred p JOIN embeddings q ON q.vec_id = p.vec_id
       |  GROUP BY 1, 2)
       |SELECT actual_label, predicted_label, n,
       |  CAST(n AS DOUBLE)
       |    / CAST(sum(n) OVER (PARTITION BY actual_label) AS DOUBLE) AS row_share
       |FROM cells ORDER BY actual_label, predicted_label""".stripMargin

  // ---------------------------------------------------- pq_distortion_eval

  /** PQ/ADC distortion eval: for each query's ADC shortlist, the
    * table-lookup distance against the EXACT micro-unit squared
    * distance — ratio, mean absolute relative error, and overshoot
    * share per query. The quality ledger behind trusting
    * `ann_pq_topk`'s shortlist (its recall eval says WHETHER the
    * right neighbors surface; this says HOW WRONG the distances that
    * chose them were — the codebook-retraining trigger), completing
    * the eval trio with `ann_frontier_eval` (cost) and
    * `matryoshka_recall_eval` (resolution). Every distance on both
    * sides is an exact integer (ADC sums the shared cached
    * [[pqDistTables]]; the exact side is Σ(Δqv)² on the shortlist
    * pairs only), so all three metrics are single exact-integer
    * divisions — no float accumulation anywhere. Ledger: per-pair
    * dist ≲ 4·10¹², ×50-pair shortlist ≈ 2·10¹⁴ — inside 2^53.
    *
    * Scale shape: the ADC build is the `ann_pq_topk` plan (codes +
    * broadcast query tables); the exact side touches raw vectors for
    * shortlist×dims rows ONLY — the same IO asymmetry the retriever
    * itself exploits.
    */
  def pqDistortionEval(spark: SparkSession, dir: String): DataFrame = {
    val sd = pqDistTables(spark, dir)
    val wEnc = Window.partitionBy("vec_id", "sub").orderBy(col("dist"), col("clabel"))
    val code = sd.withColumn("rn", row_number().over(wEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("clabel").as("code"))
    val qtab = sd.filter(col("vec_id") < NumQueries)
      .toDF("query_id", "q_sub", "q_clabel", "q_dist")
    val adc = code.join(broadcast(qtab),
        col("q_sub") === col("sub") && col("q_clabel") === col("code") &&
          col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("q_dist")).as("adc"))
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    val sl = adc.withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= Shortlist)
      .select(col("query_id"), col("neighbor_id"), col("adc"))
    val ex = Tables(spark, dir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).cast("long").as("qv"))
    val exact = sl
      .join(ex.toDF("query_id", "d", "qa"), "query_id")
      .join(ex.toDF("neighbor_id", "d", "qb"), Seq("neighbor_id", "d"))
      .groupBy(col("query_id"), col("neighbor_id"), col("adc"))
      .agg(sum((col("qa") - col("qb")) * (col("qa") - col("qb"))).as("ex_d"))
    exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ex_d")).as("se"), sum(col("adc")).as("sa"),
        sum(abs(col("adc") - col("ex_d"))).as("sabs"),
        sum(when(col("adc") > col("ex_d"), 1L).otherwise(0L)).as("n_over"))
      .selectExpr("query_id",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        "CAST(sa AS DOUBLE) / CAST(se AS DOUBLE) AS adc_to_exact_ratio",
        "CAST(sabs AS DOUBLE) / CAST(se AS DOUBLE) AS mean_abs_rel_err",
        "CAST(n_over AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS overshoot_share")
      .orderBy("query_id")
  }

  val pqDistortionEvalSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |sd AS (
       |  SELECT e.vec_id, e.d // $NSub AS sub, c.label AS clabel,
       |         sum((e.qv - c.cv) * (e.qv - c.cv)) AS dist
       |  FROM ex e JOIN cent c ON c.d = e.d
       |  GROUP BY 1, 2, 3),
       |code AS (
       |  SELECT vec_id, sub, clabel AS code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, clabel) AS rn FROM sd) r0
       |  WHERE rn = 1),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, CAST(sum(q.dist) AS BIGINT) AS adc
       |  FROM code c JOIN sd q ON q.sub = c.sub AND q.clabel = c.code
       |  WHERE q.vec_id < $NumQueries AND q.vec_id != c.vec_id
       |  GROUP BY 1, 2),
       |sl AS (SELECT query_id, neighbor_id, adc
       |       FROM (SELECT query_id, neighbor_id, adc,
       |               row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS srk
       |             FROM adc) r1
       |       WHERE srk <= $Shortlist),
       |exact AS (
       |  SELECT s.query_id, s.neighbor_id, s.adc,
       |    CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS ex_d
       |  FROM sl s
       |  JOIN ex a ON a.vec_id = s.query_id
       |  JOIN ex b ON b.vec_id = s.neighbor_id AND b.d = a.d
       |  GROUP BY 1, 2, 3)
       |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(adc) AS DOUBLE) / CAST(sum(ex_d) AS DOUBLE) AS adc_to_exact_ratio,
       |  CAST(sum(abs(adc - ex_d)) AS DOUBLE) / CAST(sum(ex_d) AS DOUBLE) AS mean_abs_rel_err,
       |  CAST(sum(CASE WHEN adc > ex_d THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS overshoot_share
       |FROM exact GROUP BY query_id ORDER BY query_id""".stripMargin

  // ----------------------------------------------------- ivf_cell_occupancy

  /** IVF cell-occupancy diagnostic: per coarse cell, its population,
    * corpus share, and the c(c−1)/2 candidate-pair bound — the
    * `lsh_bucket_occupancy` read for the DATA-ADAPTIVE quantizer (the
    * number the IVF scale argument rests on: probe cost ∝ Σ over
    * probed cells of c, pair joins ∝ Σc²). A skewed occupancy table
    * is the early warning that cells need re-training or splitting
    * before the probe join hot-spots; pairs with `ann_frontier_eval`
    * (which prices the same cells from the recall side).
    *
    * Scale shape: the assignment is the IVF coarse quantizer itself —
    * centroids domain-bounded and broadcast as ONE row, per-vector
    * cell choice map-side, then a cell-grain partial agg. Nothing
    * shuffles at corpus width.
    */
  def ivfCellOccupancy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val q6 = transform(col("embedding"),
      v => floor(v.cast("double") * lit(1e6)).cast("double"))
    val ex = e.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("label"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).as("qv"))
    val cent = ex.groupBy(col("label"), col("d"))
      .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).as("cv"))
    val cells = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("cv")))),
        s => s.getField("cv").cast("double")).as("c6"))
      .select(col("label").as("cell"), col("c6"))
      .withColumn("cnorm", sqrt(call_function("graft_dot", col("c6"), col("c6"))))
    val cellsRow = cells.agg(collect_list(struct(col("cell"), col("c6"),
      col("cnorm"))).as("cs"))
    e.select(col("vec_id"), q6.as("q6"))
      .join(broadcast(cellsRow))
      .withColumn("cell", expr(
        "element_at(array_sort(transform(cs, s -> struct(-(graft_dot(q6, s.c6) / s.cnorm) AS negscore, s.cell AS cell))), 1).cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy()))
      .selectExpr("cell", "CAST(c AS BIGINT) AS n_vectors",
        "CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS cell_share",
        "CAST(c * (c - 1) div 2 AS BIGINT) AS pair_bound")
      .orderBy("cell")
  }

  val ivfCellOccupancySql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, label, CAST(generate_subscripts(embedding,1) - 1 AS INTEGER) AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS qv
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, d, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
       |  FROM ex GROUP BY label, d),
       |cy AS (SELECT label, sqrt(CAST(sum(cv*cv) AS DOUBLE)) AS cnorm FROM cent GROUP BY label),
       |scores AS (
       |  SELECT e.vec_id, c.label AS cell,
       |         CAST(sum(e.qv * c.cv) AS DOUBLE) / any_value(cy.cnorm) AS score
       |  FROM ex e JOIN cent c ON c.d = e.d JOIN cy ON cy.label = c.label
       |  GROUP BY e.vec_id, c.label),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS cell_rank
       |    FROM scores) r0 WHERE cell_rank = 1),
       |g AS (SELECT cell, CAST(count(*) AS BIGINT) AS c FROM assigned GROUP BY 1),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM g)
       |SELECT cell, c AS n_vectors,
       |  CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS cell_share,
       |  CAST(c * (c - 1) // 2 AS BIGINT) AS pair_bound
       |FROM g, t ORDER BY cell""".stripMargin

  // ------------------------------------------------------------- ann_ndcg_eval

  private val NdcgK = 10

  /** Oracle twin of [[evalRankedTopK]] — the labeled cosine top-10
    * CTE chain shared verbatim by the NDCG and MRR oracle texts. */
  private lazy val EvalRankedCte: String =
    s"""q6 AS (SELECT vec_id, label, list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1e6) AS BIGINT)) AS q FROM embeddings),
       |ex AS (SELECT vec_id, unnest(q) AS qv, generate_subscripts(q, 1) - 1 AS d FROM q6),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |rels AS (SELECT qq.vec_id AS query_id, cc.vec_id AS cid,
       |    any_value(qq.label) AS q_label, any_value(cc.label) AS c_label,
       |    CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS relv
       |  FROM q6 qq JOIN q6 cc ON qq.vec_id < $NumQueries AND cc.vec_id != qq.vec_id
       |    JOIN ex a ON a.vec_id = qq.vec_id
       |    JOIN ex b ON b.vec_id = cc.vec_id AND b.d = a.d
       |    JOIN nrm na ON na.vec_id = qq.vec_id
       |    JOIN nrm nb ON nb.vec_id = cc.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, cid, rank,
       |    CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY relv DESC, cid) AS rank
       |        FROM rels) z
       |  WHERE rank <= $NdcgK)""".stripMargin

  /** NDCG@10 of the cosine retrieval against label relevance: does
    * the embedding space rank same-label neighbors FIRST, not just
    * somewhere in the top-k (`ann_recall_eval` scores set overlap —
    * position-blind; NDCG is the ranking metric a retrieval eval
    * actually reports, discounting hits by 1/log₂(rank+1)). The
    * ranked list is the q6 micro-unit cosine top-10 (deterministic
    * order), relevance is label equality, IDCG re-ranks the SAME
    * list ideally (rel desc, rank asc), and every log₂ is
    * ExactLn(x)/ExactLn(2) — shared-text, so even the discounted
    * gains hash-match. Per-query rows; ndcg = 0 when nothing
    * relevant was retrieved.
    *
    * Scale shape: candidate generation is the broadcast-query
    * map-only scan (IVF-probe swappable); everything after is ≤10
    * rows per query.
    */
  /** Shared labeled top-[[NdcgK]] ranking for the retrieval evals
    * (`ann_ndcg_eval`, `ann_mrr_eval`): q6 micro-unit cosine with the
    * deterministic (relv desc, cid) order, rel = label equality.
    * Session-shared via [[graft.core.SharedFrames]] — candidate
    * scoring is the one expensive pass; both evals are ≤10-rows-per-
    * query arithmetic on top of it.
    */
  private def evalRankedTopK(spark: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.get(spark, "ann.evalRanked", dir,
      Set("ann_ndcg_eval", "ann_mrr_eval")) {
      graft.functions.DotProduct.register(spark)
      val e = Tables(spark, dir).embeddings
      val q6 = withQ6Norm(e, "uid", "u", "nrm")
        .join(e.select(col("vec_id").as("uid"), col("label")), Seq("uid"))
      val q = q6.toDF("query_id", "q_emb", "q_n", "q_label")
        .filter(col("query_id") < NumQueries)
      val wRel = Window.partitionBy("query_id").orderBy(col("relv").desc, col("cid"))
      q6.toDF("cid", "c_emb", "c_n", "c_label")
        .join(broadcast(q), col("query_id") =!= col("cid"))
        .withColumn("relv", expr("graft_dot(q_emb, c_emb) / (q_n * c_n)"))
        .withColumn("rank", row_number().over(wRel))
        .filter(col("rank") <= NdcgK)
        .select(col("query_id"), col("cid"), col("rank"),
          when(col("c_label") === col("q_label"), 1L).otherwise(0L).as("rel"))
    }

  def annNdcgEval(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactLn
    val ranked = evalRankedTopK(spark, dir)
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("rank"))
    ranked
      .withColumn("ideal_rank", row_number().over(wIdeal))
      .withColumn("__ya", expr(ExactLn.yExpr("CAST(rank + 1 AS DOUBLE)")))
      .withColumn("__za", expr(ExactLn.zExpr("__ya")))
      .withColumn("__yi", expr(ExactLn.yExpr("CAST(ideal_rank + 1 AS DOUBLE)")))
      .withColumn("__zi", expr(ExactLn.zExpr("__yi")))
      .withColumn("__y2", expr(ExactLn.yExpr("2.0")))
      .withColumn("__z2", expr(ExactLn.zExpr("__y2")))
      .withColumn("g", expr(
        s"CAST(rel AS DOUBLE) * ${ExactLn.lnExpr("__z2")} / ${ExactLn.lnExpr("__za")}"))
      .withColumn("gi", expr(
        s"CAST(rel AS DOUBLE) * ${ExactLn.lnExpr("__z2")} / ${ExactLn.lnExpr("__zi")}"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(col("rel")).as("n_rel"),
        sum(expr("CAST(round(g, 9) AS DECIMAL(18,9))")).as("dcgd"),
        sum(expr("CAST(round(gi, 9) AS DECIMAL(18,9))")).as("idcgd"))
      .selectExpr("query_id", "CAST(k AS BIGINT) AS k",
        "CAST(n_rel AS BIGINT) AS n_rel",
        "CAST(dcgd AS DOUBLE) AS dcg", "CAST(idcgd AS DOUBLE) AS idcg",
        """CASE WHEN n_rel = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(dcgd AS DOUBLE) / CAST(idcgd AS DOUBLE) END AS ndcg""".stripMargin)
      .orderBy("query_id")
  }

  val annNdcgEvalSql: String = {
    import graft.functions.ExactLn
    s"""WITH $EvalRankedCte,
       |ir AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, rank) AS ideal_rank FROM ranked),
       |ya AS (SELECT *, ${ExactLn.yExpr("CAST(rank + 1 AS DOUBLE)")} AS __ya, ${ExactLn.yExpr("CAST(ideal_rank + 1 AS DOUBLE)")} AS __yi, ${ExactLn.yExpr("2.0")} AS __y2 FROM ir),
       |za AS (SELECT *, ${ExactLn.zExpr("__ya")} AS __za, ${ExactLn.zExpr("__yi")} AS __zi, ${ExactLn.zExpr("__y2")} AS __z2 FROM ya),
       |g AS (SELECT *,
       |    CAST(rel AS DOUBLE) * ${ExactLn.lnExpr("__z2")} / ${ExactLn.lnExpr("__za")} AS g,
       |    CAST(rel AS DOUBLE) * ${ExactLn.lnExpr("__z2")} / ${ExactLn.lnExpr("__zi")} AS gi
       |  FROM za),
       |agg AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS k, CAST(sum(rel) AS BIGINT) AS n_rel,
       |    sum(CAST(round(g, 9) AS DECIMAL(18,9))) AS dcgd,
       |    sum(CAST(round(gi, 9) AS DECIMAL(18,9))) AS idcgd
       |  FROM g GROUP BY 1)
       |SELECT query_id, k, n_rel,
       |  CAST(dcgd AS DOUBLE) AS dcg, CAST(idcgd AS DOUBLE) AS idcg,
       |  CASE WHEN n_rel = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(dcgd AS DOUBLE) / CAST(idcgd AS DOUBLE) END AS ndcg
       |FROM agg ORDER BY query_id""".stripMargin
  }

  // ------------------------------------------------------------- ann_mrr_eval

  /** MRR@10 over the SAME labeled ranking `ann_ndcg_eval` scores
    * ([[evalRankedTopK]], session-shared): reciprocal rank of the
    * FIRST same-label hit, 0 when nothing relevant lands in the
    * top-10 — the metric retrieval evals quote when only the first
    * useful hit matters (RAG context slot 1, known-item search).
    * rr is an exact small-integer ratio in double; the pooled MRR
    * reduces via the round-to-decimal sum, so everything
    * hash-matches. Per-query rows, pooled `mrr` on every row (the
    * psi_total convention).
    *
    * Scale shape: candidate generation is the shared broadcast-query
    * map-only scan; this query adds one ≤10-rows-per-query aggregate
    * and a 1-row broadcast for the pooled mean.
    */
  def annMrrEval(spark: SparkSession, dir: String): DataFrame = {
    val per = evalRankedTopK(spark, dir)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1L, col("rank"))).as("fr"))
      .withColumn("first_rel_rank", coalesce(col("fr"), lit(0)).cast("long"))
      .withColumn("rr", expr(
        """CASE WHEN first_rel_rank = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(1 AS DOUBLE) / CAST(first_rel_rank AS DOUBLE) END""".stripMargin))
    val pooled = per.agg(
        sum(expr("CAST(round(rr, 9) AS DECIMAL(18,9))")).as("rrd"),
        count(lit(1)).as("nq"))
      .selectExpr("CAST(rrd AS DOUBLE) / CAST(nq AS DOUBLE) AS mrr")
    per.crossJoin(broadcast(pooled))
      .selectExpr("query_id", "CAST(k AS BIGINT) AS k",
        "CAST(n_rel AS BIGINT) AS n_rel", "first_rel_rank",
        "rr AS reciprocal_rank", "mrr")
      .orderBy("query_id")
  }

  val annMrrEvalSql: String =
    s"""WITH $EvalRankedCte,
       |per AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(rel) AS BIGINT) AS n_rel,
       |    CAST(coalesce(min(CASE WHEN rel = 1 THEN rank END), 0) AS BIGINT) AS first_rel_rank
       |  FROM ranked GROUP BY 1),
       |pr AS (SELECT *,
       |    CASE WHEN first_rel_rank = 0 THEN CAST(0 AS DOUBLE)
       |    ELSE CAST(1 AS DOUBLE) / CAST(first_rel_rank AS DOUBLE) END AS rr
       |  FROM per),
       |pool AS (SELECT CAST(sum(CAST(round(rr, 9) AS DECIMAL(18,9))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS mrr FROM pr)
       |SELECT query_id, k, n_rel, first_rel_rank, rr AS reciprocal_rank, mrr
       |FROM pr, pool ORDER BY query_id""".stripMargin

  // ----------------------------------------------------------- ann_mmr_rerank

  private val MmrCand = 10
  private val MmrSelect = 5
  // λ = 0.7: literal texts shared by both engines (0.3 is written as a
  // literal, not computed as 1 − 0.7, so the bits match by parsing)
  private val MmrLambda = "CAST(0.7 AS DOUBLE)"
  private val MmrOneMinus = "CAST(0.3 AS DOUBLE)"

  /** Maximal-marginal-relevance rerank of each query's top-10
    * retrieval: greedily select 5 of 10 maximizing
    * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — the diversity pass a
    * retrieval stack runs AFTER the ANN index so near-duplicate hits
    * don't crowd the context window (`semdedup_prune` removes dups
    * from the CORPUS; this de-dups each RESULT LIST at query time).
    * Every similarity is a q6 micro-unit cosine (exact-integer dot
    * < 2⁵³ over correctly-rounded sqrt/div — bit-identical across
    * engines, see [[withQ6Norm]]), and each greedy step is one
    * fixed-form IEEE expression + (score desc, id) argmax, so the
    * whole selection SEQUENCE is deterministic and the oracle replays
    * it as 4 unrolled CTE steps.
    *
    * Scale shape: candidate generation is the broadcast-query
    * map-only corpus scan (at 100 TB, swap in the IVF probe — MMR
    * only reads the candidate frame); after that everything is
    * per-query bounded: ≤10 candidates, ≤90 pair sims, 4 unrolled
    * steps of (anti-join, max-over-≤4-selected, argmax) on cached
    * bounded frames.
    */
  def annMmrRerank(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val q6 = withQ6Norm(e, "uid", "u", "nrm")
    val q = q6.filter(col("uid") < NumQueries).toDF("query_id", "q_emb", "q_n")
    val wRel = Window.partitionBy("query_id").orderBy(col("rel").desc, col("cid"))
    val cand = graft.core.OwnedCaches.own(
      q6.toDF("cid", "c_emb", "c_n")
        .join(broadcast(q), col("query_id") =!= col("cid"))
        .withColumn("rel", expr("graft_dot(q_emb, c_emb) / (q_n * c_n)"))
        .withColumn("rk", row_number().over(wRel))
        .filter(col("rk") <= MmrCand)
        .select(col("query_id"), col("cid"), col("c_emb"), col("c_n"), col("rel"))
        .cache())
    val pair = graft.core.OwnedCaches.own(
      cand.select(col("query_id"), col("cid").as("pa"),
          col("c_emb").as("ea"), col("c_n").as("na"))
        .join(cand.select(col("query_id"), col("cid").as("pb"),
          col("c_emb").as("eb"), col("c_n").as("nb")), Seq("query_id"))
        .filter(col("pa") =!= col("pb"))
        .select(col("query_id"), col("pa"), col("pb"),
          expr("graft_dot(ea, eb) / (na * nb)").as("s"))
        .cache())
    // Single-task greedy replay (optimization round 18): the unrolled
    // per-step plan (anti-join + two joins + agg + window, each step
    // cached) cost ~38 scheduled jobs over frames that are CONSTANT-
    // bounded — cand ≤ NumQueries·MmrCand rows and pair ≤
    // NumQueries·MmrCand² at ANY corpus size, so unlike the graph
    // replays no data-sized admission cap is needed. The relevance and
    // pairwise-similarity frames are still computed distributed (the
    // corpus-width work); one mapPartitions task replays the greedy
    // selection bit-identically: same 0.7·rel − 0.3·pen double ops,
    // same max-over-selected penalty, same (score desc, cid asc)
    // tie-break the per-step windows applied. Branch equality is
    // pinned by Round18dSpec.
    val sess = spark
    import sess.implicits._
    val candT = cand.select(col("query_id").cast("long").as("q"),
      col("cid").cast("long").as("a"), lit(-1L).as("b"),
      col("rel").cast("double").as("v"), lit(0).as("tag"))
    val pairT = pair.select(col("query_id").cast("long").as("q"),
      col("pa").cast("long").as("a"), col("pb").cast("long").as("b"),
      col("s").cast("double").as("v"), lit(1).as("tag"))
    val selectN = MmrSelect
    val result = candT.unionByName(pairT)
      .as[(Long, Long, Long, Double, Int)]
      .repartition(1)
      .mapPartitions(it => mmrGreedyReplay(it.toArray, selectN, 0.7, 0.3))
      .toDF("query_id", "cid", "mmr_rank")
    result.select(col("query_id"), col("cid").as("neighbor_id"), col("mmr_rank"))
      .orderBy("query_id", "mmr_rank")
  }

  /** The single-task MMR greedy-selection replay body — bit-identical
    * to the unrolled per-step plan: step 1 picks max (rel desc, cid
    * asc); each later step scores every unselected candidate as
    * λ·rel − (1−λ)·pen with pen = max similarity to the already-
    * selected set, and picks max (score desc, cid asc). All doubles,
    * same op order as the SQL text; a query with fewer candidates
    * than steps simply stops early (the plan's empty pen$i frames).
    */
  private[graft] def mmrGreedyReplay(rows: Array[(Long, Long, Long, Double, Int)],
      select: Int, lam: Double, oneMinus: Double): Iterator[(Long, Long, Int)] = {
    val byQ = rows.groupBy(_._1).toSeq.sortBy(_._1)
    byQ.iterator.flatMap { case (q, rs) =>
      val cands = rs.filter(_._5 == 0).map(r => (r._2, r._4))
      val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Double]
      rs.foreach { r => if (r._5 == 1) sim.update((r._2, r._3), r._4) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (cands.nonEmpty) {
        var best = cands(0)
        cands.foreach { c =>
          if (c._2 > best._2 || (c._2 == best._2 && c._1 < best._1)) best = c
        }
        out += ((q, best._1, 1)); selected += best._1
        var step = 2
        while (step <= select) {
          var bestC = -1L; var bestScore = 0.0; var found = false
          cands.foreach { case (cid, rel) =>
            if (!selected.contains(cid)) {
              var pen = 0.0; var any = false
              selected.foreach { s =>
                sim.get((cid, s)).foreach { v =>
                  if (!any || v > pen) { pen = v; any = true }
                }
              }
              if (any) {
                val score = lam * rel - oneMinus * pen
                if (!found || score > bestScore ||
                    (score == bestScore && cid < bestC)) {
                  bestC = cid; bestScore = score; found = true
                }
              }
            }
          }
          if (found) { out += ((q, bestC, step)); selected += bestC }
          step += 1
        }
      }
      out.iterator
    }
  }

  val annMmrRerankSql: String = {
    val steps = (2 to MmrSelect).map { i =>
      val prev = s"sel${i - 1}"
      s"""rem$i AS (
         |  SELECT c.* FROM cand c LEFT JOIN $prev s
         |    ON c.query_id = s.query_id AND c.cid = s.cid
         |  WHERE s.cid IS NULL),
         |pen$i AS (
         |  SELECT r.query_id, r.cid, r.rel, max(p.s) AS pen
         |  FROM rem$i r JOIN $prev s ON s.query_id = r.query_id
         |    JOIN pair p ON p.query_id = r.query_id AND p.pa = r.cid AND p.pb = s.cid
         |  GROUP BY 1, 2, 3),
         |pick$i AS (
         |  SELECT query_id, cid, $i AS mmr_rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY $MmrLambda * rel - $MmrOneMinus * pen DESC, cid) AS rk
         |    FROM pen$i) z WHERE rk = 1),
         |sel$i AS (SELECT query_id, cid FROM sel${i - 1}
         |  UNION ALL SELECT query_id, cid FROM pick$i)""".stripMargin
    }.mkString(",\n")
    val picks = (2 to MmrSelect).map(i =>
      s"SELECT * FROM pick$i").mkString("\n      UNION ALL ")
    s"""WITH q6 AS (SELECT vec_id, list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)*1e6) AS BIGINT)) AS q FROM embeddings),
       |ex AS (SELECT vec_id, unnest(q) AS qv, generate_subscripts(q, 1) - 1 AS d FROM q6),
       |nrm AS (SELECT vec_id, sqrt(CAST(sum(qv*qv) AS DOUBLE)) AS nrm FROM ex GROUP BY vec_id),
       |rels AS (SELECT qq.vec_id AS query_id, cc.vec_id AS cid,
       |    CAST(sum(a.qv * b.qv) AS DOUBLE) / (any_value(na.nrm) * any_value(nb.nrm)) AS rel
       |  FROM q6 qq JOIN q6 cc ON qq.vec_id < $NumQueries AND cc.vec_id != qq.vec_id
       |    JOIN ex a ON a.vec_id = qq.vec_id
       |    JOIN ex b ON b.vec_id = cc.vec_id AND b.d = a.d
       |    JOIN nrm na ON na.vec_id = qq.vec_id
       |    JOIN nrm nb ON nb.vec_id = cc.vec_id
       |  GROUP BY 1, 2),
       |cand AS MATERIALIZED (SELECT query_id, cid, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rk
       |    FROM rels) z WHERE rk <= $MmrCand),
       |pair AS MATERIALIZED (
       |  SELECT x.query_id, x.cid AS pa, y.cid AS pb,
       |    CAST(sum(ea.qv * eb.qv) AS DOUBLE) / (any_value(nna.nrm) * any_value(nnb.nrm)) AS s
       |  FROM cand x JOIN cand y ON x.query_id = y.query_id AND x.cid != y.cid
       |    JOIN ex ea ON ea.vec_id = x.cid
       |    JOIN ex eb ON eb.vec_id = y.cid AND eb.d = ea.d
       |    JOIN nrm nna ON nna.vec_id = x.cid
       |    JOIN nrm nnb ON nnb.vec_id = y.cid
       |  GROUP BY 1, 2, 3),
       |pick1 AS (SELECT query_id, cid, 1 AS mmr_rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rk
       |    FROM cand) z WHERE rk = 1),
       |sel1 AS (SELECT query_id, cid FROM pick1),
       |$steps
       |SELECT query_id, cid AS neighbor_id, CAST(mmr_rank AS INTEGER) AS mmr_rank
       |FROM (SELECT * FROM pick1
       |      UNION ALL $picks) u
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  // ------------------------------------------------------ embedding_isotropy_audit

  /** Isotropy audit of the embedding space via the EXACT sum-vector
    * identity: Σ_{i≠j} û_i·û_j = ‖Σ û‖² − Σ‖û‖², so the mean pairwise
    * cosine — the Ethayarajh anisotropy number; contextual encoders
    * often sit near 0.5-0.9 where a healthy retrieval space sits near
    * 0 — costs ONE O(n·d) pass instead of the n² it naively reads as.
    * Vectors are unit-normalized onto a 10⁶ integer grid (floor —
    * deterministic), so per-dimension component sums are exact
    * integer-valued doubles (exact while n·10⁶ < 2⁵³), squared-sum
    * terms are 1e12-normalized and 6-dp quantized, and the identity
    * is deterministic bit-for-bit. `embedding_norm_profile` audits
    * magnitudes; this audits DIRECTION concentration — the number
    * that says whether cosine top-k has any contrast to work with.
    *
    * Scale shape: one map pass (normalize + self-dot), one posexplode
    * → dim-grain partial agg (the embedding_centroids shuffle shape,
    * d-bounded output), two scalar reductions. Nothing pairwise ever
    * materializes.
    */
  def embeddingIsotropyAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    // the fused codegen'd primitive: interpreted transform() lambdas
    // re-run per element per reference (19 s at 10× un-staged, 10 s
    // staged); graft_qunit runs the identical IEEE ops once per row
    graft.functions.QuantUnitVector.register(spark)
    val base = Tables(spark, dir).embeddings
      .withColumn("u", expr("graft_qunit(embedding)"))
      .filter(col("u").isNotNull)
    // ONE exploded aggregation carries everything: per-dimension
    // component sums (exact integer-valued doubles), the exact
    // DECIMAL Σuk² (so Σ‖u‖² needs no second scan and no round()
    // halfway case — the deviation from the nominal nv·10¹² is exact
    // decimal algebra), and nv as the per-dimension row count
    val dimAgg = base
      .select(posexplode(col("u")).as(Seq("d", "uk")))
      .groupBy(col("d"))
      .agg(sum(col("uk")).as("sk"),
        sum(expr("CAST(uk * uk AS DECIMAL(38,0))")).as("sqs"),
        count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("dim"), max(col("cnt")).as("nv"),
        sum(expr("CAST(round((sk / CAST(1000000 AS DOUBLE)) * (sk / CAST(1000000 AS DOUBLE)), 6) AS DECIMAL(28,6))"))
          .as("ssq"),
        sum(col("sqs")).as("stot"))
      .withColumn("sdev", expr(
        "stot - CAST(nv AS DECIMAL(38,0)) * CAST(1000000000000 AS DECIMAL(38,0))"))
    dimAgg
      .selectExpr("CAST(nv AS BIGINT) AS n_vectors", "CAST(dim AS BIGINT) AS dim",
        "CAST(1 AS DOUBLE) + CAST(sdev AS DOUBLE)" +
          " / (CAST(nv AS DOUBLE) * CAST(1000000000000 AS DOUBLE)) AS mean_unit_norm2",
        "(CAST(ssq AS DOUBLE) - (CAST(nv AS DOUBLE) + CAST(sdev AS DOUBLE)" +
          " / CAST(1000000000000 AS DOUBLE)))" +
          " / (CAST(nv AS DOUBLE) * CAST(nv - 1 AS DOUBLE)) AS mean_pairwise_cosine")
  }

  val embeddingIsotropyAuditSql: String =
    """WITH mv AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(v AS DOUBLE) * 1000) AS DOUBLE) for v in embedding] AS m
      |  FROM embeddings),
      |nn AS (
      |  SELECT vec_id, m,
      |    CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), m), (a, x) -> a + x * x) AS BIGINT) AS n2
      |  FROM mv),
      |u AS (
      |  SELECT vec_id,
      |    [CAST(floor(x * CAST(1000000 AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))) AS DOUBLE) for x in m] AS u
      |  FROM nn WHERE n2 > 0),
      |dx AS (
      |  SELECT generate_subscripts(u, 1) AS d, unnest(u) AS uk FROM u),
      |da AS (
      |  SELECT d, sum(uk) AS sk, sum(CAST(uk * uk AS DECIMAL(38,0))) AS sqs,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM dx GROUP BY 1),
      |dd AS (
      |  SELECT CAST(count(*) AS BIGINT) AS dim, CAST(max(cnt) AS BIGINT) AS nv,
      |    sum(CAST(round((sk / CAST(1000000 AS DOUBLE)) * (sk / CAST(1000000 AS DOUBLE)), 6) AS DECIMAL(28,6))) AS ssq,
      |    sum(sqs) AS stot
      |  FROM da),
      |dv AS (
      |  SELECT *, stot - CAST(nv AS DECIMAL(38,0)) * CAST(1000000000000 AS DECIMAL(38,0)) AS sdev
      |  FROM dd)
      |SELECT nv AS n_vectors, dim,
      |  CAST(1 AS DOUBLE) + CAST(sdev AS DOUBLE)
      |    / (CAST(nv AS DOUBLE) * CAST(1000000000000 AS DOUBLE)) AS mean_unit_norm2,
      |  (CAST(ssq AS DOUBLE) - (CAST(nv AS DOUBLE) + CAST(sdev AS DOUBLE)
      |    / CAST(1000000000000 AS DOUBLE)))
      |    / (CAST(nv AS DOUBLE) * CAST(nv - 1 AS DOUBLE)) AS mean_pairwise_cosine
      |FROM dv""".stripMargin

  // --------------------------------------------------------- ann_range_search

  /** Cosine radius for the range query (on the q6 micro-unit grid, so
    * the ≥-boundary is bit-deterministic across engines — no
    * adjacent-sim-gap assumption needed for a THRESHOLD the way there
    * is for a rank cut).
    */
  private val RangeTau = 0.45

  /** Range (radius) search: for each query in the fixed anchor panel,
    * ALL corpus vectors within cosine ≥ τ — the "every near neighbor,
    * not the top k" face of vector retrieval (dedup candidate pull,
    * recall-complete RAG context, blocklist screening). Top-k and
    * range are different contracts: k bounds the OUTPUT, τ bounds the
    * GEOMETRY, and a fixed k silently truncates dense neighborhoods
    * while a radius returns them whole. Per anchor: the in-range
    * count, the min/max in-range similarity (q12 ints — exact), and
    * the nearest id — count 0 rows keep the anchor with NULL extrema
    * (left join), so panel coverage is explicit.
    *
    * Scale shape: the anchor panel broadcasts against the corpus scan
    * (map-only O(anchors·n), the recall-audit convention — never a
    * corpus self-join); the per-anchor aggregate is map-side partial.
    * At corpus scale the same τ-screen composes with the IVF cell
    * route exactly as the near-dup family does ([[cellNearDupPairs]]);
    * this is the exact-scan face, the one recall audits need.
    */
  def annRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    val e = Tables(spark, dir).embeddings
    val q = withQ6Norm(e, "query_id", "qv", "qn").filter(col("query_id") < NumQueries)
    val c = withQ6Norm(e, "neighbor_id", "cv", "cn")
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        call_function("graft_dot", col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("sim") >= RangeTau)
      .withColumn("sim_q12", expr("CAST(floor(sim * 1e12) AS BIGINT)"))
    val agg = sims.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_in_range"),
        max(col("sim_q12")).as("max_sim_q12"),
        min(col("sim_q12")).as("min_sim_q12"),
        min(struct(negate(col("sim_q12")), col("neighbor_id")))
          .getField("neighbor_id").as("nearest_id"))
    q.select(col("query_id"))
      .join(agg, Seq("query_id"), "left")
      .withColumn("n_in_range", coalesce(col("n_in_range"), lit(0L)))
      .orderBy("query_id")
  }

  val annRangeSearchSql: String =
    s"""WITH q6 AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE)*1e6) AS DOUBLE) for x in embedding] AS qv
       |  FROM embeddings),
       |nrm AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS nm FROM q6),
       |s AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.qv, c.qv) / (q.nm * c.nm) AS sim
       |  FROM nrm q JOIN nrm c ON q.vec_id != c.vec_id
       |  WHERE q.vec_id < $NumQueries),
       |inr AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(floor(sim * 1e12) AS BIGINT) AS sim_q12
       |  FROM s WHERE sim >= $RangeTau),
       |rk AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_q12 DESC, neighbor_id) AS rn
       |  FROM inr),
       |agg AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_in_range,
       |    max(sim_q12) AS max_sim_q12, min(sim_q12) AS min_sim_q12,
       |    max(CASE WHEN rn = 1 THEN neighbor_id END) AS nearest_id
       |  FROM rk GROUP BY 1)
       |SELECT q.vec_id AS query_id,
       |  coalesce(a.n_in_range, 0) AS n_in_range,
       |  a.max_sim_q12, a.min_sim_q12, a.nearest_id
       |FROM q6 q LEFT JOIN agg a ON a.query_id = q.vec_id
       |WHERE q.vec_id < $NumQueries
       |ORDER BY query_id""".stripMargin
}
