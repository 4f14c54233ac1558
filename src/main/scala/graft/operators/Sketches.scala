package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching (SURVEY.md §2 E): a HyperLogLog
  * built entirely from declarative two-stage aggregation, so every
  * stage gets map-side partial aggregation — the sketch shape that
  * replaces exact count-distinct at 100 TB (exact distinct is a full
  * shuffle of every key; the sketch shuffles ≤ m tiny (group, bucket)
  * rows per group).
  *
  * Unusually for an HLL, this one is BIT-REPRODUCIBLE across engines,
  * so it is value-checked in the DuckDB oracle rather than
  * rows-only:
  *   - the element hash is the leading 32-bit MD5 word (same
  *     derivation as the minhash/simhash family — see
  *     [[graft.functions.Md5Words]]);
  *   - bucket = top 6 hash bits (m = 64), rho = leading-zero count of
  *     the remaining 26 bits + 1, computed via `length(bin(x))`
  *     (identical minimal-binary-string semantics in Spark and
  *     DuckDB);
  *   - the harmonic sum Σ 2^-M is EXACT in double arithmetic for any
  *     summation order: every term is a multiple of 2^-27 and the
  *     total is < 64, so all partial sums sit inside a 33-bit
  *     significand span — below double's 53 bits;
  *   - the remaining ops (multiply, divide by the alpha constant) are
  *     correctly-rounded IEEE with identical operand order on both
  *     sides.
  * No small/large-range correction is applied (that would need `ln`,
  * which is not correctly rounded); the raw alpha-corrected estimate
  * IS this engine's definition, on both sides of the gate. Accuracy
  * therefore holds for n ≳ m — exactly the regime the sketch exists
  * for (below that, run the exact distinct; it's cheap there).
  */
object Sketches {

  private[graft] val P = 6 // bucket bits
  private[graft] val M = 1 << P // 64 buckets
  private[graft] val SuffixBits = 32 - P // 26
  private[graft] val SuffixMask = (1 << SuffixBits) - 1 // 67108863

  /** The alpha-corrected estimate, as ONE SQL string shared verbatim by
    * the Spark plan and the DuckDB oracle. Every literal is explicitly
    * CAST to DOUBLE — Spark parses bare `0.7213` as DECIMAL(5,4) and
    * DuckDB as its own DECIMAL, and decimal-vs-double promotion rules
    * differ between engines; forcing doubles first makes every op a
    * correctly-rounded IEEE double op with identical operand order.
    */
  private[graft] val EstimateExpr: String =
    s"(CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE)+CAST(1.079 AS DOUBLE)/CAST($M AS DOUBLE)))" +
      s" * CAST($M AS DOUBLE) * CAST($M AS DOUBLE) / (CAST($M - nb AS DOUBLE) + zsum)"

  /** THE register derivation — one definition for every face of the
    * sketch (batch per-type, hierarchical rollup, streaming sink), so
    * the hash/bucket/rho constants cannot drift between them:
    * per-(groupCols, bucket) max-rho registers of `src`'s `user_id`.
    * The inner distinct is free correctness margin (max is
    * idempotent) but caps the shuffle at distinct keys; both aggs
    * partial-aggregate map-side.
    */
  private[graft] def rhoRegisters(src: DataFrame, groupCols: Seq[String]): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val suffix = col("h").bitwiseAND(lit(SuffixMask.toLong))
    src.select(groupCols.map(col) :+ col("user_id"): _*).distinct()
      .withColumn("h", h)
      .select(groupCols.map(col) :+ shiftright(col("h"), SuffixBits).as("bucket") :+
        when(suffix === 0, SuffixBits + 1)
          .otherwise(lit(SuffixBits + 1) - length(bin(suffix))).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Approximate distinct users per event type via HLL(m=64), with the
    * exact count and the relative error alongside (the exact side is
    * the expensive path the sketch replaces — kept here so the gate
    * also pins the estimator's accuracy contract).
    */
  def approxDistinctHll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events.select(col("event_type"), col("user_id"))
    val regs = rhoRegisters(ev, Seq("event_type"))
    val z = regs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nb"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("zsum"))
      .withColumn("hll_estimate", expr(EstimateExpr))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    z.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("hll_estimate"),
        ((col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_error"))
      .orderBy("event_type")
  }

  val approxDistinctHllSql: String =
    s"""WITH h AS (
      |  SELECT event_type, ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM (SELECT DISTINCT event_type, user_id FROM events)),
      |br AS (
      |  SELECT event_type, h >> $SuffixBits AS bucket,
      |    CASE WHEN h & $SuffixMask = 0 THEN ${SuffixBits + 1}
      |         ELSE ${SuffixBits + 1} - length(bin(h & $SuffixMask)) END AS rho
      |  FROM h),
      |regs AS (SELECT event_type, bucket, max(rho) AS m FROM br GROUP BY 1, 2),
      |z AS (SELECT event_type, count(*) AS nb,
      |        sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS zsum
      |      FROM regs GROUP BY 1),
      |est AS (SELECT event_type,
      |          $EstimateExpr AS hll_estimate
      |        FROM z),
      |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
      |SELECT est.event_type, ex.n_exact, est.hll_estimate,
      |  (est.hll_estimate - CAST(ex.n_exact AS DOUBLE)) / CAST(ex.n_exact AS DOUBLE) AS rel_error
      |FROM est JOIN ex ON ex.event_type = est.event_type
      |ORDER BY est.event_type""".stripMargin

  /** HLL register-space ROLLUP — the MERGEABILITY property that makes
    * sketches the 100 TB answer to hierarchical distinct counts: the
    * raw event log is read ONCE to build per-(event_type, month,
    * bucket) registers; the month level, the per-type level, and the
    * grand total are all produced by merging REGISTERS (max per
    * bucket — idempotent, associative), never by re-scanning raw
    * data. An exact-distinct rollup would re-shuffle every key at
    * every level; here each coarser level aggregates a register table
    * of ≤ groups × 64 rows. Register merge is lossless for HLL (the
    * merged registers are exactly what a direct sketch of the merged
    * stream would hold — unit-tested against `approx_distinct_hll`),
    * so the same bit-reproducibility argument as the base sketch
    * applies and all three levels are value-gated in DuckDB.
    */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"),
        substring(timestamp_micros(col("ts_us")).cast("date").cast("string"), 1, 7)
          .as("month"),
        col("user_id"))
    val regs = graft.core.OwnedCaches.own(
      rhoRegisters(ev, Seq("event_type", "month"))
        .cache()) // one raw pass; every level below reads only this
    def estimate(level: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = level
      .agg(count(lit(1)).as("nb"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("zsum"))
      .withColumn("hll_estimate", expr(EstimateExpr))
      .select(col("event_type"), col("month"), col("nb"), col("hll_estimate"))
    val perMonth = estimate(regs.groupBy(col("event_type"), col("month")))
    val perType = estimate(regs
      .groupBy(col("event_type"), col("bucket")).agg(max(col("m")).as("m"))
      .withColumn("month", lit("ALL"))
      .groupBy(col("event_type"), col("month")))
    val grand = estimate(regs
      .groupBy(col("bucket")).agg(max(col("m")).as("m"))
      .withColumn("event_type", lit("ALL")).withColumn("month", lit("ALL"))
      .groupBy(col("event_type"), col("month")))
    perMonth.union(perType).union(grand)
      .orderBy("event_type", "month")
  }

  val hllRollupSql: String =
    s"""WITH d AS (
      |  SELECT DISTINCT event_type,
      |    substr(CAST(CAST(ts AS DATE) AS VARCHAR), 1, 7) AS month, user_id
      |  FROM events),
      |h AS (
      |  SELECT event_type, month,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM d),
      |br AS (
      |  SELECT event_type, month, h >> $SuffixBits AS bucket,
      |    CASE WHEN h & $SuffixMask = 0 THEN ${SuffixBits + 1}
      |         ELSE ${SuffixBits + 1} - length(bin(h & $SuffixMask)) END AS rho
      |  FROM h),
      |regs AS (SELECT event_type, month, bucket, max(rho) AS m FROM br GROUP BY 1, 2, 3),
      |lvl AS (
      |  SELECT event_type, month, bucket, max(m) AS m FROM regs GROUP BY 1, 2, 3
      |  UNION ALL
      |  SELECT event_type, 'ALL', bucket, max(m) FROM regs GROUP BY 1, 3
      |  UNION ALL
      |  SELECT 'ALL', 'ALL', bucket, max(m) FROM regs GROUP BY 3),
      |z AS (SELECT event_type, month, count(*) AS nb,
      |        sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS zsum
      |      FROM lvl GROUP BY 1, 2)
      |SELECT event_type, month, nb, $EstimateExpr AS hll_estimate
      |FROM z ORDER BY event_type, month""".stripMargin

  private[graft] val CmsD = 4 // hash rows
  private[graft] val CmsW = 256 // buckets per row

  /** h_r(k): bucket of key `k` under hash row `r` — the r-th 32-bit
    * word of ONE md5(k) mod W (the [[Md5Words]] convention; a 128-bit
    * MD5 carries exactly d=4 independent 32-bit words, so the whole
    * row family costs ONE hash per fact row instead of four, and
    * stays bit-reproducible in the DuckDB oracle).
    */
  private def cmsBucket(r: Int, hex: org.apache.spark.sql.Column) =
    conv(substring(hex, 8 * r + 1, 8), 16, 10).cast("long") % CmsW

  /** Count-Min heavy hitters: top-20 lineitem part keys by their
    * COUNT-MIN ESTIMATED frequency (estimate = min over d=4 hash rows
    * of the w=256-cell counters), with the exact count and the
    * one-sided overestimate alongside (CMS never undercounts —
    * est ≥ exact is the sketch's guarantee, unit-tested over every
    * key).
    *
    * Scale shape: the sketch state is d·w = 1024 counter rows NO
    * MATTER the corpus size — the fact stream fans out d× map-side
    * (posexplode over d bucket expressions) into a partial-aggregated
    * (row, bucket) count: one shuffle of ≤ d·w rows per map task.
    * Estimates then need only the DISTINCT-key table probing a
    * broadcast 1024-row cell table — at 100 TB that's the vocab-sized
    * frame, not the corpus. (The exact-count column is the expensive
    * path the sketch replaces; it rides along here as the accuracy
    * audit, same contract as `approx_distinct_hll`'s n_exact.)
    */
  def cmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem.select(col("l_partkey").as("k"))
    val buckets = (0 until CmsD).map(r => cmsBucket(r, md5(col("k").cast("string"))))
    // fact side: hash ONCE per row below the Generate, fan out a
    // static row-index array, slice the hex after — a generator
    // expression gets no common-subexpression elimination, so
    // exploding array(bucket_0..bucket_3) directly would re-run the
    // md5 d times per fact row (measured 1.3× on the whole query)
    val cells = li
      .select(md5(col("k").cast("string")).as("h"))
      .select(explode(array((0 until CmsD).map(lit): _*)).as("r"), col("h"))
      .select(col("r"),
        conv(expr(s"substring(h, r * 8 + 1, 8)"), 16, 10).cast("long") % CmsW as "b")
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
    val keys = li.groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
    keys
      .select(col("k"), col("exact_count"),
        posexplode(array(buckets: _*)).as(Seq("r", "b")))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("k"), col("exact_count"))
      .agg(min(col("c")).as("est_count"))
      .orderBy(col("est_count").desc, col("k"))
      .limit(20)
      .select(col("k").as("part_key"), col("est_count"), col("exact_count"),
        (col("est_count") - col("exact_count")).as("overestimate"))
  }

  val cmsTopkSql: String = {
    def bucket(r: Int, k: String) =
      s"('0x'||substr(md5(CAST($k AS VARCHAR)),${8 * r + 1},8))::BIGINT % $CmsW"
    val rows = (0 until CmsD)
      .map(r => s"SELECT $r AS r, ${bucket(r, "k")} AS b, k FROM li")
      .mkString("\n  UNION ALL ")
    s"""WITH li AS (SELECT l_partkey AS k FROM lineitem),
       |hx AS (
       |  $rows),
       |cells AS (SELECT r, b, count(*) AS c FROM hx GROUP BY r, b),
       |keys AS (SELECT k, count(*) AS exact_count FROM li GROUP BY k),
       |kb AS (
       |  ${(0 until CmsD).map(r =>
            s"SELECT k, $r AS r, ${bucket(r, "k")} AS b FROM keys")
            .mkString("\n  UNION ALL ")}),
       |est AS (
       |  SELECT kb.k, min(c.c) AS est_count
       |  FROM kb JOIN cells c ON c.r = kb.r AND c.b = kb.b GROUP BY kb.k)
       |SELECT est.k AS part_key, est.est_count, keys.exact_count,
       |  est.est_count - keys.exact_count AS overestimate
       |FROM est JOIN keys ON keys.k = est.k
       |ORDER BY est.est_count DESC, est.k LIMIT 20""".stripMargin
  }

  /** Trailing-7-day distinct users per day, SKETCHED: the sliding-
    * window face of HLL mergeability, and the at-scale companion to
    * `Commerce.activeUsersWindow`. The exact rewrite fans out every
    * (user, day) row ×7; here ONE raw pass builds per-(day, bucket)
    * registers and only the REGISTER TABLE (≤ days × 64 rows) fans
    * out across the window days — merge is max-per-bucket, so the
    * trailing estimate for a day is bit-identical to sketching its
    * 7-day union directly. Sliding distinct cost becomes
    * 7 × days × 64 register rows, independent of user count — THE
    * trade that makes a 90-day rolling MAU tractable at 10⁹ users.
    * The exact count rides along as the accuracy audit (same
    * contract as `approx_distinct_hll`) ONLY when `audit = true` —
    * the audit is a countDistinct over the 7× user-day fan-out, i.e.
    * exactly the intractable exact sliding distinct this sketch
    * exists to avoid, so the production path (`audit = false`, the
    * default for library callers) emits the register-derived estimate
    * alone: NOTHING user-sized ever fans out — only the days × 64
    * register table explodes across window days (plan-pinned in
    * PlanAuditSpec). The oracled `SparkEntry` entry keeps
    * `audit = true` at test scale, where the accuracy contract is
    * worth paying for. The whole table, including the alpha-corrected
    * estimates, is bit-reproducible in DuckDB.
    */
  def activeUsersHll(spark: SparkSession, dir: String, audit: Boolean = false): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(timestamp_micros(col("ts_us")).cast("date").as("d"), col("user_id"))
    // cached (operator-owned, ≤ days × 64 rows): the register table
    // feeds both the window merge and the max-day scalar — uncached,
    // the one-row `mx` side re-ran the whole raw register build
    val regs = graft.core.OwnedCaches.own(rhoRegisters(ev, Seq("d")).cache())
    val mx = regs.agg(max(col("d")).as("__mx"))
    val merged = regs
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("day"),
        col("bucket"), col("m"))
      .crossJoin(broadcast(mx)).filter(col("day") <= col("__mx"))
      .groupBy(col("day"), col("bucket")).agg(max(col("m")).as("m"))
    val est = merged.groupBy(col("day"))
      .agg(count(lit(1)).as("nb"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("zsum"))
      .withColumn("wau7_estimate", expr(EstimateExpr))
    if (!audit)
      est.select(col("day").cast("string").as("day"), col("wau7_estimate"))
        .orderBy("day")
    else {
      val exact = ev.distinct()
        .select(col("user_id"), explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
        .crossJoin(broadcast(mx)).filter(col("day") <= col("__mx"))
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau7_exact"))
      est.join(exact, "day")
        .select(col("day").cast("string").as("day"), col("wau7_exact"),
          col("wau7_estimate"),
          ((col("wau7_estimate") - col("wau7_exact").cast("double")) /
            col("wau7_exact").cast("double")).as("rel_error"))
        .orderBy("day")
    }
  }

  val activeUsersHllSql: String =
    s"""WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |h AS (SELECT d, ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT AS h
      |      FROM ud),
      |br AS (SELECT d, h >> $SuffixBits AS bucket,
      |         CASE WHEN h & $SuffixMask = 0 THEN ${SuffixBits + 1}
      |              ELSE ${SuffixBits + 1} - length(bin(h & $SuffixMask)) END AS rho
      |       FROM h),
      |regs AS (SELECT d, bucket, max(rho) AS m FROM br GROUP BY 1, 2),
      |mx AS (SELECT max(d) AS mx FROM regs),
      |i7 AS (SELECT CAST(unnest(range(7)) AS INTEGER) AS i),
      |mrg AS (SELECT d + i AS day, bucket, max(m) AS m
      |        FROM regs, i7 WHERE d + i <= (SELECT mx FROM mx) GROUP BY 1, 2),
      |z AS (SELECT day, count(*) AS nb,
      |        sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS zsum
      |      FROM mrg GROUP BY 1),
      |est AS (SELECT day, $EstimateExpr AS wau7_estimate FROM z),
      |ex AS (SELECT day, count(DISTINCT user_id) AS wau7_exact FROM (
      |         SELECT user_id, d + i AS day FROM ud, i7
      |         WHERE d + i <= (SELECT mx FROM mx)) GROUP BY 1)
      |SELECT CAST(est.day AS VARCHAR) AS day, ex.wau7_exact, est.wau7_estimate,
      |  (est.wau7_estimate - CAST(ex.wau7_exact AS DOUBLE))
      |    / CAST(ex.wau7_exact AS DOUBLE) AS rel_error
      |FROM est JOIN ex ON ex.day = est.day
      |ORDER BY day""".stripMargin

  /** EXACT distinct users per event type — and the exact grand total —
    * via BITMAP aggregation, the mergeable exact counterpart of the
    * HLL sketch (the bitmap-index technique warehouses use when the
    * key space is dense integers): user u sets bit u%64 of word
    * u div 64, `bit_or` folds masks with map-side partial aggregation
    * (a plain count-distinct shuffles every raw KEY; this shuffles at
    * most groups × ⌈keyspace/64⌉ word rows — 64× less, and ∝ occupied
    * words when sparse), and popcounts finish it. Like `hll_rollup`,
    * the ALL row is produced by RE-MERGING the per-type word masks
    * (bit_or is idempotent ∨ associative), never by rescanning raw
    * data — but unlike HLL the merged result is exact, which is the
    * entire trade: O(keyspace/64) state instead of O(64 registers).
    * The oracle states plain COUNT(DISTINCT) — the bitmap rewrite is
    * invisible in the result.
    */
  /** THE word-mask derivation — shared by the batch query and the
    * streaming [[graft.streaming.BitmapSink]] so the two faces cannot
    * drift: per-(groupCols, word) bit_or of `user_id` bit masks.
    * Requires non-negative ids (`div`/`%` keep sign otherwise).
    */
  private[graft] def bitmapWords(src: DataFrame, groupCols: Seq[String]): DataFrame =
    src
      .select(groupCols.map(col) :+
        expr("user_id div 64").as("w") :+
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))").as("m"): _*)
      .groupBy((groupCols :+ "w").map(col): _*)
      .agg(expr("bit_or(m)").as("mask"))

  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val words = graft.core.OwnedCaches.own(bitmapWords(
      Tables(spark, dir).events.select(col("event_type"), col("user_id")),
      Seq("event_type"))
      .cache()) // one raw pass; the ALL row merges these words
    val perType = words.groupBy(col("event_type"))
      .agg(sum(bit_count(col("mask"))).as("n_users"))
    val all = words.groupBy(col("w")).agg(expr("bit_or(mask)").as("mask"))
      .agg(sum(bit_count(col("mask"))).as("n_users"))
      .select(lit("ALL").as("event_type"), col("n_users"))
    perType.unionByName(all).orderBy("event_type")
  }

  val bitmapDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT 'ALL', count(DISTINCT user_id) FROM events
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------- bitmap_intersect

  /** EXACT pairwise audience overlap via bitmap AND — distinct users
    * in A∩B for every pair of event types, with Jaccard. The same
    * word-mask state [[bitmapDistinct]] builds serves all 10 pairs:
    * the pair join runs WORD-ALIGNED (equi-join on the word index —
    * masks AND together per word, popcounts sum), so intersecting two
    * billion-user audiences moves ⌈keyspace/64⌉ words per side, never
    * raw user ids, and missing words drop out of the inner join
    * because their AND is zero anyway. The oracle states the plain
    * COUNT(DISTINCT) self-join semantics — the bitmap rewrite is
    * invisible in the result.
    *
    * Scale shape: ONE raw pass builds the per-type words (map-side
    * bit_or partial agg); everything after is word-space algebra,
    * ∝ occupied words × pairs. jaccard = exact ints, one division.
    */
  def bitmapIntersect(spark: SparkSession, dir: String): DataFrame = {
    val words = graft.core.OwnedCaches.own(bitmapWords(
      Tables(spark, dir).events.select(col("event_type"), col("user_id")),
      Seq("event_type"))
      .cache()) // one raw pass; totals AND pair joins both read this
    val totals = words.groupBy(col("event_type"))
      .agg(sum(bit_count(col("mask"))).as("n"))
    val a = words.select(col("event_type").as("type_a"), col("w"), col("mask").as("ma"))
    val b = words.select(col("event_type").as("type_b"), col("w"), col("mask").as("mb"))
    a.join(b, Seq("w")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(bit_count(col("ma").bitwiseAND(col("mb")))).as("n_intersect"))
      .join(broadcast(totals.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "n_a")), "type_a")
      .join(broadcast(totals.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_intersect"),
        expr("CAST(n_intersect AS DOUBLE) / CAST(n_a + n_b - n_intersect AS DOUBLE)")
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  val bitmapIntersectSql: String =
    """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
      |t AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
      |i AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_intersect
      |  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT i.type_a, i.type_b,
      |  CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
      |  CAST(i.n_intersect AS BIGINT) AS n_intersect,
      |  CAST(i.n_intersect AS DOUBLE) / CAST(ta.n + tb.n - i.n_intersect AS DOUBLE)
      |    AS jaccard
      |FROM i JOIN t ta ON ta.event_type = i.type_a
      |JOIN t tb ON tb.event_type = i.type_b
      |ORDER BY i.type_a, i.type_b""".stripMargin

  // ----------------------------------------------------------- hll_intersect

  /** SKETCH-SPACE pairwise overlap: estimated distinct users in A∩B
    * for every event-type pair by inclusion–exclusion over HLL
    * registers — est(A) + est(B) − est(A∪B), where the union estimate
    * comes from the bucketwise MAX of the two register sets (the
    * merge that makes HLL a lattice; no raw data is touched to form
    * ANY union). This is the sketch-algebra dual of
    * [[bitmapIntersect]]: O(64) state per side instead of
    * O(keyspace/64), at estimate accuracy instead of exactness — the
    * standard trade when audiences are web-scale and approximate
    * overlap is enough (intersection error compounds, which is why
    * the exact bitmap variant exists beside it).
    *
    * Scale shape: one raw register-build pass; pair algebra runs on a
    * pairs × 64 grid — constant size at ANY corpus. The whole table,
    * estimates included, is bit-reproducible in the oracle
    * ([[EstimateExpr]] discipline).
    */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val spk = spark
    import spk.implicits._
    val regs = graft.core.OwnedCaches.own(rhoRegisters(
      Tables(spark, dir).events.select(col("event_type"), col("user_id")),
      Seq("event_type"))
      .cache()) // one raw pass; per-type and pair estimates read this
    def estOf(grouped: DataFrame, keys: Seq[String]): DataFrame = grouped
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("nb"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("zsum"))
      .withColumn("est", expr(EstimateExpr))
      .select(keys.map(col) :+ col("est"): _*)
    val perType = estOf(regs, Seq("event_type"))
    val types = regs.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("type_a"))
      .crossJoin(types.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
    // union registers: pairs × bucket spine, bucketwise max of both
    // sides (absent register = 0, i.e. the bucket stays empty unless
    // either side filled it)
    val spine = (0L until M.toLong).toDF("bucket") // long: matches shiftright's type
    val grid = pairs.crossJoin(broadcast(spine))
      .join(regs.select(col("event_type").as("type_a"), col("bucket"),
        col("m").as("m_a")), Seq("type_a", "bucket"), "left")
      .join(regs.select(col("event_type").as("type_b"), col("bucket"),
        col("m").as("m_b")), Seq("type_b", "bucket"), "left")
      .select(col("type_a"), col("type_b"),
        greatest(coalesce(col("m_a"), lit(0)), coalesce(col("m_b"), lit(0))).as("mu"))
      .filter(col("mu") > 0)
      .withColumnRenamed("mu", "m")
    val unionEst = estOf(grid, Seq("type_a", "type_b"))
      .withColumnRenamed("est", "est_union")
    unionEst
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("est").as("est_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("est").as("est_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
      .orderBy("type_a", "type_b")
  }

  val hllIntersectSql: String =
    s"""WITH h AS (
      |  SELECT event_type, ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM (SELECT DISTINCT event_type, user_id FROM events)),
      |br AS (
      |  SELECT event_type, h >> $SuffixBits AS bucket,
      |    CASE WHEN h & $SuffixMask = 0 THEN ${SuffixBits + 1}
      |         ELSE ${SuffixBits + 1} - length(bin(h & $SuffixMask)) END AS rho
      |  FROM h),
      |regs AS (SELECT event_type, bucket, max(rho) AS m FROM br GROUP BY 1, 2),
      |z1 AS (SELECT event_type, count(*) AS nb,
      |         sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS zsum
      |       FROM regs GROUP BY 1),
      |e1 AS (SELECT event_type, $EstimateExpr AS est FROM z1),
      |ty AS (SELECT DISTINCT event_type FROM regs),
      |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
      |sp AS (SELECT CAST(unnest(range($M)) AS INTEGER) AS bucket),
      |grid AS (
      |  SELECT pr.type_a, pr.type_b,
      |    greatest(coalesce(ra.m, 0), coalesce(rb.m, 0)) AS m
      |  FROM pr CROSS JOIN sp
      |  LEFT JOIN regs ra ON ra.event_type = pr.type_a AND ra.bucket = sp.bucket
      |  LEFT JOIN regs rb ON rb.event_type = pr.type_b AND rb.bucket = sp.bucket),
      |zu AS (SELECT type_a, type_b, count(*) AS nb,
      |         sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS zsum
      |       FROM grid WHERE m > 0 GROUP BY 1, 2),
      |eu AS (SELECT type_a, type_b, $EstimateExpr AS est_union FROM zu)
      |SELECT eu.type_a, eu.type_b, ea.est AS est_a, eb.est AS est_b,
      |  eu.est_union, ea.est + eb.est - eu.est_union AS est_intersect
      |FROM eu JOIN e1 ea ON ea.event_type = eu.type_a
      |JOIN e1 eb ON eb.event_type = eu.type_b
      |ORDER BY eu.type_a, eu.type_b""".stripMargin

  // ----------------------------------------------------------- spacesaving_topk

  /** Counter capacity per group. Sized for the REPORT (top-10 with
    * slack), not the corpus: at every test SF the per-flag supplier
    * vocabulary fits under it, so no counter ever evicts, est == true
    * count and err == 0 — which is exactly what pins the output
    * deterministic enough to hash-gate against a plain GROUP BY
    * oracle. At 100 TB the vocabulary overflows the capacity and the
    * eviction/merge machinery engages — that regime's guarantees
    * (est ∈ [true, true+err], >2n/k coverage under forced merges) are
    * pinned by the Round9Spec SpaceSaving unit tests; this entry pins
    * the end-to-end plumbing.
    */
  private val SsCapacity = 4096

  /** Per-return-flag top-10 suppliers by line count via the
    * [[graft.functions.SpaceSaving]] mergeable heavy-hitters
    * aggregate (VERDICT r9 #7: the aggregate existed as a
    * unit-tested engine component but no registered query exercised
    * it end-to-end) — with the exact count riding along and the
    * Metwally bound est ∈ [true, true + err] ASSERTED in-query
    * (`bound_ok`, hash-gated TRUE on every row).
    *
    * vs `cms_topk`: CMS needs a second pass (or an exact distinct)
    * to supply candidate keys; SpaceSaving carries its own candidate
    * set in the aggregation buffer — one pass, O(groups·k) shuffle
    * bytes regardless of input rows.
    *
    * Scale shape: the one-pass bounded-memory top-k — map tasks ship
    * ≤ [[SsCapacity]] counters per group no matter how many fact rows
    * they saw; the exact-count join is the accuracy audit the sketch
    * replaces at scale (same rides-along contract as
    * `approx_distinct_hll.n_exact` / `cms_topk.exact_count`).
    */
  def spacesavingTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SpaceSaving.register(spark)
    val li = Tables(spark, dir).lineitem
      .select(col("l_returnflag"), col("l_suppkey"))
    val top = li.groupBy(col("l_returnflag"))
      .agg(expr(s"graft_spacesaving($SsCapacity, l_suppkey)").as("hh"))
      .select(col("l_returnflag"),
        posexplode(expr("slice(hh, 1, 10)")).as(Seq("pos", "c")))
      .select(col("l_returnflag").as("return_flag"),
        (col("pos") + 1).cast("int").as("rank"),
        col("c.key").as("supp_key"), col("c.est").as("est_count"),
        col("c.err").as("err_bound"))
    val exact = li.groupBy(col("l_returnflag").as("xf"), col("l_suppkey").as("xk"))
      .agg(count(lit(1)).as("exact_count"))
    top.join(broadcast(exact),
        col("return_flag") === col("xf") && col("supp_key") === col("xk"))
      .select(col("return_flag"), col("rank"), col("supp_key"),
        col("est_count"), col("err_bound"), col("exact_count"),
        (col("est_count") >= col("exact_count") &&
          col("est_count") <= col("exact_count") + col("err_bound")).as("bound_ok"))
      .orderBy("return_flag", "rank")
  }

  /** Oracle = exact per-group top-10 by (count desc, key) — valid
    * because at test SF the summary never evicts (capacity > per-flag
    * vocabulary), making SpaceSaving exact and its tie order the same
    * (-est, key) sort on both sides.
    */
  val spacesavingTopkSql: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_suppkey, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT l_returnflag, l_suppkey, cnt,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY cnt DESC, l_suppkey) AS rk
      |  FROM c)
      |SELECT l_returnflag AS return_flag, CAST(rk AS INTEGER) AS rank,
      |  l_suppkey AS supp_key, cnt AS est_count,
      |  CAST(0 AS BIGINT) AS err_bound, cnt AS exact_count,
      |  TRUE AS bound_ok
      |FROM r WHERE rk <= 10
      |ORDER BY return_flag, rank""".stripMargin

  // ---------------------------------------------------- quantile_sketch_audit

  private val QsBuckets = 256
  private val QsQuantiles = Seq(50, 95, 99)

  /** Equi-width histogram quantile sketch audited against the exact
    * answer: order totals (exact cents) hash into [[QsBuckets]]
    * fixed-width buckets in ONE map-side pass, each target quantile
    * reads its ceil-rank bucket and reports the bucket MIDPOINT, and
    * the audit joins the exact ceil-rank quantile next to it with
    * abs/relative error — the accuracy-vs-cost readout that justifies
    * replacing a full sort with a bounded sketch at 100 TB (same
    * contract as the HLL above: the sketch is cheap, the audit proves
    * how cheap is safe). Bucket indices and both quantile positions
    * are exact integer cross-products; only the two error ratios are
    * doubles.
    *
    * Scale shape: the sketch side partial-aggregates to ≤[[QsBuckets]]
    * rows (map-side combine does almost all the work); the exact side
    * is a value-grain count histogram + cumulative window — the
    * ground truth the audit exists to compare against, kept to ONE
    * pass; quantile extraction runs on bounded frames.
    */
  def quantileSketchAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables(spark, dir).orders
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
    val bounds = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"))
    val hist = v.crossJoin(broadcast(bounds))
      .select(expr(s"((v - mn) * $QsBuckets) div (mx - mn + 1)").as("bk"),
        col("mn"), col("mx"), col("n"))
      .groupBy(col("bk"), col("mn"), col("mx"), col("n"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val exact = v.groupBy(col("v")).agg(count(lit(1)).as("cv"))
      .withColumn("cumv", sum(col("cv")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val rows = QsQuantiles.map { q =>
      val est = hist
        .filter(col("cum") >= expr(s"($q * n + 99) div 100"))
        .agg(min(col("bk")).as("bk"), max(col("mn")).as("mn"),
          max(col("mx")).as("mx"), max(col("n")).as("n"))
        .selectExpr(s"CAST($q AS BIGINT) AS q", "n",
          "mn + (bk * (mx - mn + 1)) div " + QsBuckets + " AS lo_b",
          s"mn + ((bk + 1) * (mx - mn + 1)) div $QsBuckets - 1 AS hi_b")
        .selectExpr("q", "n", "(lo_b + hi_b) div 2 AS est_value")
      val ex = exact.crossJoin(broadcast(bounds.select(col("n").as("n2"))))
        .filter(col("cumv") >= expr(s"($q * n2 + 99) div 100"))
        .agg(min(col("v")).as("exact_value"))
      est.crossJoin(ex)
    }
    rows.reduce(_ unionByName _)
      .selectExpr("q", "CAST(n AS BIGINT) AS n_rows",
        s"CAST($QsBuckets AS BIGINT) AS n_buckets",
        "CAST(est_value AS BIGINT) AS est_value",
        "CAST(exact_value AS BIGINT) AS exact_value",
        "CAST(abs(est_value - exact_value) AS BIGINT) AS abs_err",
        """CASE WHEN exact_value = 0 THEN CAST(0 AS DOUBLE)
          |ELSE CAST(abs(est_value - exact_value) AS DOUBLE) / CAST(exact_value AS DOUBLE) END AS rel_err""".stripMargin)
      .orderBy("q")
  }

  val quantileSketchAuditSql: String = {
    val qrows = QsQuantiles.map { q =>
      s"""SELECT $q AS q, n,
         |    (SELECT min(bk) FROM hist WHERE cum >= ($q * b.n + 99) // 100) AS bk,
         |    mn, mx,
         |    (SELECT min(v) FROM exact WHERE cumv >= ($q * b.n + 99) // 100) AS exact_value
         |  FROM b""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH vals AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |b AS (SELECT CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx,
       |    CAST(count(*) AS BIGINT) AS n FROM vals),
       |hist AS (
       |  SELECT bk, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(count(*)) OVER (ORDER BY bk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM (SELECT ((v - mn) * $QsBuckets) // (mx - mn + 1) AS bk FROM vals, b) h
       |  GROUP BY bk),
       |exact AS (
       |  SELECT v, CAST(sum(count(*)) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumv
       |  FROM vals GROUP BY v),
       |qq AS (
       |  $qrows),
       |est AS (
       |  SELECT q, n, exact_value,
       |    mn + (bk * (mx - mn + 1)) // $QsBuckets AS lo_b,
       |    mn + ((bk + 1) * (mx - mn + 1)) // $QsBuckets - 1 AS hi_b
       |  FROM qq)
       |SELECT CAST(q AS BIGINT) AS q, n AS n_rows,
       |  CAST($QsBuckets AS BIGINT) AS n_buckets,
       |  CAST((lo_b + hi_b) // 2 AS BIGINT) AS est_value,
       |  CAST(exact_value AS BIGINT) AS exact_value,
       |  CAST(abs((lo_b + hi_b) // 2 - exact_value) AS BIGINT) AS abs_err,
       |  CASE WHEN exact_value = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE CAST(abs((lo_b + hi_b) // 2 - exact_value) AS DOUBLE) / CAST(exact_value AS DOUBLE) END AS rel_err
       |FROM est ORDER BY q""".stripMargin
  }
}
