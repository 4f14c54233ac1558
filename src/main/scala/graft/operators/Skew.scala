package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.money
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling patterns (SURVEY.md §5). AQE's skew-join splitting
  * covers joins; for *aggregations* on heavily-skewed keys the classic
  * fix is explicit two-stage salting, exposed here as a reusable
  * helper. Results are identical to a direct groupBy (the oracle for
  * the demo query below IS the plain GROUP BY).
  */
object Skew {

  /** Two-stage salted sum: stage 1 spreads each hot key over
    * `buckets` salted partials (shuffle keys (key, salt) — no single
    * reducer owns a hot key), stage 2 merges the ≤`buckets` partial
    * rows per key. For decimal/long measures both stages are exact,
    * so salting is invisible in the result.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(value).as("_partial"), count(lit(1)).as("_n"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("salted_sum"), sum(col("_n")).as("n_rows"))
  }

  /** Demo on the most skewed key in the data (3 return-flag values over
    * the whole lineitem table): salted revenue per flag. Oracle = the
    * plain GROUP BY, proving the two-stage rewrite is result-identical.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_returnflag"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
    saltedSum(li, Seq("l_returnflag"), col("rev"))
      .select(col("l_returnflag"), col("salted_sum").cast("double").as("revenue"),
        col("n_rows"))
      .orderBy("l_returnflag")
  }

  val saltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unique-entity extraction with per-group counts (the reference's
    * ip_processor "extract unique IPs" aggregation pipeline, reference:
    * `5.data-collection-storage/ip_processor.py:70-101`
    * save_unique_ips_to_file).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val distinctCountsSql: String =
    """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private val SaltBuckets = 8

  /** Explicitly salted JOIN for skewed keys: the fact side gets a
    * deterministic salt (row-key mod R), the dim side is replicated
    * R ways, and the join runs on (key, salt) — splitting a hot key's
    * rows across R tasks instead of landing them on one straggler.
    * This is the manual form of what AQE's skew-join split does at
    * runtime; it exists for engines/plans where the skew is KNOWN
    * up front (and as the only option under static planning). The
    * oracle is the plain unsalted join+agg — the rewrite is provably
    * invisible in the result.
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val fact = t.lineitem.select(col("l_suppkey"), col("l_orderkey"),
        (money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).as("rev"))
      .withColumn("salt", (col("l_orderkey") % SaltBuckets).cast("int"))
    val dim = t.supplier.select(col("s_suppkey"), col("s_name"))
      .withColumn("salt", explode(sequence(lit(0), lit(SaltBuckets - 1))))
    // hint a sort-merge join: at demo scale the replicated dim would
    // broadcast (making the salt decorative) — the pattern exists for
    // the shuffle-join regime, so pin that plan shape here
    fact.join(dim.hint("merge"),
        col("l_suppkey") === col("s_suppkey") && fact("salt") === dim("salt"))
      .groupBy(col("s_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("s_name")
  }

  val saltedJoinSql: String =
    """SELECT s_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  private val BloomBits = 4096
  private val BloomHashes = 3

  /** Bloom-filter join pruning (runtime-filter shape): build a k-hash
    * Bloom filter over the dim-side join keys (here: BUILDING-segment
    * customers) and pre-filter the fact scan against it BEFORE any
    * join — the pattern that turns a fact-side shuffle of 100 TB into
    * a shuffle of only probable matches. The filter is O(m) = 4096
    * positions however large the dim side grows, and rides one
    * broadcast. Output keeps every Bloom-passing fact row with its
    * `is_true_match` flag, so the measured false-positive rate is part
    * of the gated result.
    *
    * Deterministic by construction: positions are MD5-word hashes mod
    * m (the same family as the sketch suite), so even the false
    * positives are bit-reproducible in the DuckDB oracle — an
    * approximate structure under an exact gate.
    */
  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def position(i: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(i.cast("string"), lit("_"), key.cast("string"))), 1, 8), 16, 10)
        .cast("long") % BloomBits
    val hashes = explode(sequence(lit(0), lit(BloomHashes - 1))).as("i")
    val dim = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // build side: fold the dim keys' bit positions into ONE row — a
    // word→mask map covering all 4096 bits (≤64 entries, ~1 KB). All
    // exchanges here touch only the dim side; the size is O(m) no
    // matter how large the dim grows.
    val bitmap = dim.select(hashes, col("c_custkey"))
      .select(position(col("i"), col("c_custkey")).as("b")).distinct()
      .groupBy(expr("CAST(b DIV 64 AS INT)").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(b % 64 AS INT)))").as("mask"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bm"))
    // probe side: the fact stream NEVER shuffles before the membership
    // test — the one-row bitmap rides a broadcast and all k positions
    // are checked in a single map-side conjunction (no explode, no
    // groupBy of the fact). This is the runtime-filter shape that
    // prunes a 100 TB scan down to probable matches BEFORE any
    // exchange.
    def hit(p: String): Column = expr(
      s"(shiftright(coalesce(try_element_at(bm, CAST($p DIV 64 AS INT)), CAST(0 AS BIGINT)), " +
        s"CAST($p % 64 AS INT)) & 1) = 1")
    val probe = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .crossJoin(broadcast(bitmap))
    val withPos = (0 until BloomHashes).foldLeft(probe) { (df, i) =>
      df.withColumn(s"p$i", position(lit(i), col("o_custkey")))
    }
    val passed = withPos
      .filter((0 until BloomHashes).map(i => hit(s"p$i")).reduce(_ && _))
      .select(col("o_orderkey"), col("o_custkey"))
    passed.join(broadcast(dim.select(col("c_custkey").as("o_custkey"),
          lit(1).as("tm"))), Seq("o_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"),
        coalesce(col("tm"), lit(0)).as("is_true_match"))
      .orderBy("o_orderkey")
  }

  val bloomPruneSql: String =
    s"""WITH dimkeys AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      |bits AS (
      |  SELECT DISTINCT ('0x'||substr(md5(CAST(i AS VARCHAR)||'_'||CAST(k AS VARCHAR)),1,8))::BIGINT % $BloomBits AS b
      |  FROM dimkeys, (SELECT unnest(range($BloomHashes)) AS i) h),
      |probe AS (
      |  SELECT o_orderkey, o_custkey,
      |    ('0x'||substr(md5(CAST(i AS VARCHAR)||'_'||CAST(o_custkey AS VARCHAR)),1,8))::BIGINT % $BloomBits AS b
      |  FROM orders, (SELECT unnest(range($BloomHashes)) AS i) h),
      |hits AS (
      |  SELECT o_orderkey, any_value(o_custkey) AS o_custkey, count(*) AS nhit
      |  FROM probe JOIN bits USING (b) GROUP BY o_orderkey),
      |pass AS (SELECT o_orderkey, o_custkey FROM hits WHERE nhit = $BloomHashes)
      |SELECT p.o_orderkey, p.o_custkey,
      |  CASE WHEN d.k IS NULL THEN 0 ELSE 1 END AS is_true_match
      |FROM pass p LEFT JOIN dimkeys d ON d.k = p.o_custkey
      |ORDER BY p.o_orderkey""".stripMargin

  private val SkewTopK = 10

  /** Join-key skew PROFILER — the diagnostic that decides when
    * `salted_join`/`salted_agg`/AQE skew splitting are worth their
    * cost: per-key row counts of the lineitem⋈part join key, reduced
    * to the skew report a 100 TB pipeline actually consults —
    * total/keys/max/imbalance (max ÷ exact-rational mean) and the
    * top-K share. A key with imbalance ≫ 1 is the one that strands a
    * reducer; top-K share says whether salting the few hot keys (vs
    * repartitioning everything) is enough.
    *
    * Scale shape: ONE partial-aggregated count shuffle (the counts
    * table is ≤ distinct keys); the report is a two-row-stage
    * reduction over that table and the top-K is a TakeOrdered — no
    * global sort, nothing driver-side. All ratios are int/int → the
    * whole report is hash-oracled.
    */
  def skewDiagnose(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val top = counts
      .orderBy(col("c").desc, col("l_partkey"))
      .limit(SkewTopK)
      .agg(sum(col("c")).cast("long").as("topk_rows"))
    val stats = counts.agg(
      sum(col("c")).cast("long").as("total_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      max(col("c")).cast("long").as("max_rows"))
    stats.crossJoin(top)
      .select(col("total_rows"), col("n_keys"), col("max_rows"),
        // imbalance = max / (total/keys), as one int-operand expression
        (col("max_rows").cast("double") * col("n_keys").cast("double") /
          col("total_rows").cast("double")).as("imbalance_factor"),
        (col("topk_rows").cast("double") / col("total_rows").cast("double"))
          .as("topk_share"))
  }

  val skewDiagnoseSql: String =
    s"""WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS topk_rows
      |      FROM (SELECT c FROM c ORDER BY c DESC, l_partkey LIMIT $SkewTopK)),
      |s AS (SELECT CAST(sum(c) AS BIGINT) AS total_rows,
      |        CAST(count(*) AS BIGINT) AS n_keys,
      |        CAST(max(c) AS BIGINT) AS max_rows FROM c)
      |SELECT total_rows, n_keys, max_rows,
      |  CAST(max_rows AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total_rows AS DOUBLE) AS imbalance_factor,
      |  CAST(topk_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) AS topk_share
      |FROM s, t""".stripMargin

  // ------------------------------------------------------- join_key_skew_audit

  /** Multiplicity-percentile skew audit of the two big join keys
    * (`lineitem.l_partkey`, `orders.o_custkey`): p50/p99/max key
    * multiplicity, top-1 share, and the max/mean skew ratio — the
    * pre-join read that decides whether a key needs salting
    * (`skew_diagnose` profiles ONE key's top-k; this gives the
    * percentile shape for both, and the percentiles come from the
    * COUNT-OF-COUNTS histogram, so no key-grain global sort exists
    * anywhere in the plan). Integer ceil-ranks locate the
    * percentiles exactly; ratios are guarded cast-each-operand
    * doubles.
    *
    * Scale shape: each audited key partial-aggregates to its
    * frequency frame, then to the multiplicity histogram — bounded
    * by DISTINCT MULTIPLICITY VALUES (tiny even at 10⁹ keys); the
    * cumulative window runs on that bounded spine, never on the key
    * frame.
    */
  def joinKeySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(name: String, df: DataFrame, key: String): DataFrame = {
      val hist = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("nk"))
      val wAsc = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("nk")).over(wAsc))
        .withColumn("tk", sum(col("nk")).over(Window.partitionBy()))
        .withColumn("tr", sum(expr("c * nk")).over(Window.partitionBy()))
        .agg(max(col("c")).as("maxm"),
          min(when(col("cum") >= expr("(tk + 1) div 2"), col("c"))).as("p50"),
          min(when(col("cum") >= expr("(99 * tk + 99) div 100"), col("c"))).as("p99"),
          max(col("tk")).as("n_keys"), max(col("tr")).as("n_rows"))
        .selectExpr(s"'$name' AS join_key", "CAST(n_keys AS BIGINT) AS n_keys",
          "CAST(n_rows AS BIGINT) AS n_rows",
          "CAST(p50 AS BIGINT) AS p50_mult", "CAST(p99 AS BIGINT) AS p99_mult",
          "CAST(maxm AS BIGINT) AS max_mult",
          "CAST(maxm AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share",
          "CAST(maxm AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_ratio")
    }
    audit("lineitem.l_partkey", t.lineitem.select(col("l_partkey")), "l_partkey")
      .union(audit("orders.o_custkey", t.orders.select(col("o_custkey")), "o_custkey"))
      .orderBy("join_key")
  }

  val joinKeySkewAuditSql: String = {
    def audit(name: String, table: String, key: String, tag: String): String =
      s"""f$tag AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY 1),
         |h$tag AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM f$tag GROUP BY 1),
         |w$tag AS (
         |  SELECT *,
         |    CAST(sum(nk) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(nk) OVER () AS BIGINT) AS tk,
         |    CAST(sum(c * nk) OVER () AS BIGINT) AS tr
         |  FROM h$tag),
         |a$tag AS (
         |  SELECT '$name' AS join_key, CAST(max(tk) AS BIGINT) AS n_keys,
         |    CAST(max(tr) AS BIGINT) AS n_rows,
         |    CAST(min(CASE WHEN cum >= (tk + 1) // 2 THEN c END) AS BIGINT) AS p50_mult,
         |    CAST(min(CASE WHEN cum >= (99 * tk + 99) // 100 THEN c END) AS BIGINT) AS p99_mult,
         |    CAST(max(c) AS BIGINT) AS max_mult
         |  FROM w$tag)""".stripMargin
    s"""WITH ${audit("lineitem.l_partkey", "lineitem", "l_partkey", "a")},
       |${audit("orders.o_custkey", "orders", "o_custkey", "b")}
       |SELECT join_key, n_keys, n_rows, p50_mult, p99_mult, max_mult,
       |  CAST(max_mult AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share,
       |  CAST(max_mult AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_ratio
       |FROM (SELECT * FROM aa UNION ALL SELECT * FROM ab) u
       |ORDER BY join_key""".stripMargin
  }

  // ------------------------------------------------------ shuffle_partition_sim

  private val SimPartitions = 32

  /** AQE-style shuffle-partition skew simulation: lineitem keyed by
    * `l_partkey` is hashed into [[SimPartitions]] reducer partitions
    * (hash-prefix-of-md5 — engine-portable, NOT Spark's internal
    * Murmur3, so the oracle reproduces the same layout), and each
    * partition reports its row/key load, its share, whether Spark's
    * skew rule (size > 5× median) would flag it, and how many splits
    * an AQE skew-join would cut it into (⌈rows/median⌉) —
    * `join_key_skew_audit` profiles the KEY distribution; this shows
    * what that distribution DOES to a fixed reducer layout, the
    * bridge between key skew and actual stage imbalance. Median via
    * the exact ceil-rank position on the 32-row spine; everything
    * integer except the share.
    *
    * Scale shape: one map-side hash + partial-agg to the
    * [[SimPartitions]]-row frame (count-distinct of keys is the only
    * real shuffle); all windows run on the bounded partition spine.
    */
  def shufflePartitionSim(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables(spark, dir).lineitem
      .select(expr(s"CAST(conv(substr(md5(CAST(l_partkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % $SimPartitions")
          .as("p"),
        col("l_partkey"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("l_partkey")).as("n_keys"))
    sizes
      .withColumn("rn", row_number().over(Window.orderBy("n_rows", "p")))
      .withColumn("tk", count(lit(1)).over(Window.partitionBy()))
      .withColumn("tot", sum(col("n_rows")).over(Window.partitionBy()))
      .withColumn("med", min(when(col("rn") === expr("(tk + 1) div 2"), col("n_rows")))
        .over(Window.partitionBy()))
      .selectExpr("CAST(p AS BIGINT) AS partition_id",
        "CAST(n_rows AS BIGINT) AS n_rows", "CAST(n_keys AS BIGINT) AS n_keys",
        "CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE) AS row_share",
        "CAST(med AS BIGINT) AS median_rows",
        "CASE WHEN n_rows > 5 * med THEN 1 ELSE 0 END AS skewed",
        "CASE WHEN n_rows > 5 * med THEN CAST((n_rows + med - 1) div med AS BIGINT) ELSE CAST(1 AS BIGINT) END AS n_splits")
      .orderBy("partition_id")
  }

  val shufflePartitionSimSql: String =
    s"""WITH k AS (
       |  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % $SimPartitions AS p,
       |    l_partkey
       |  FROM lineitem),
       |sizes AS (
       |  SELECT p, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_keys
       |  FROM k GROUP BY 1),
       |w AS (
       |  SELECT *,
       |    row_number() OVER (ORDER BY n_rows, p) AS rn,
       |    CAST(count(*) OVER () AS BIGINT) AS tk,
       |    CAST(sum(n_rows) OVER () AS BIGINT) AS tot
       |  FROM sizes),
       |m AS (SELECT *, CAST(min(CASE WHEN rn = (tk + 1) // 2 THEN n_rows END) OVER () AS BIGINT) AS med FROM w)
       |SELECT CAST(p AS BIGINT) AS partition_id, n_rows, n_keys,
       |  CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE) AS row_share,
       |  med AS median_rows,
       |  CASE WHEN n_rows > 5 * med THEN 1 ELSE 0 END AS skewed,
       |  CASE WHEN n_rows > 5 * med THEN (n_rows + med - 1) // med ELSE CAST(1 AS BIGINT) END AS n_splits
       |FROM m ORDER BY partition_id""".stripMargin

  // ------------------------------------------------- join_cardinality_audit

  private val CardBuckets = Seq(16, 64, 256)

  /** Histogram-based join-cardinality estimation audited against the
    * exact answer (round 14) — the cost-model diagnostic behind every
    * join-order decision: bucket both join-key histograms B ways
    * (k % B, the equi-width layout a catalog keeps), estimate
    * |events ⋈ orders| per bucket with the classical containment
    * estimator rows_e·rows_o / max(keys_e, keys_o), and report the
    * estimate next to the EXACT cardinality (computed from key-grain
    * count products — never by executing the join) for B ∈
    * {16, 64, 256}. The resolution sweep shows exactly how fast the
    * estimate converges on this key distribution — the number a
    * warehouse uses to size its statistics.
    *
    * Parity: the per-bucket estimate is an exact integer (product ≤
    * rows²/B, floor-div by greatest — Spark `div` == DuckDB `//` on
    * non-negatives), sums are order-free integer aggregates, and the
    * one double division closes err_pct identically. Ledger: per-
    * bucket products ≤ (10⁷/16)² ≈ 4·10¹¹ through ~sf10; wider
    * scales raise B with the data (a fixed-B histogram is wrong at
    * 100 TB anyway).
    *
    * Scale shape: the key-grain frames partial-aggregate map-side and
    * are cached once (reused by the exact pass and every B); each
    * B-pass is a B-row aggregate — the audit never shuffles more
    * than the key cardinality.
    */
  def joinCardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ek = graft.core.OwnedCaches.own(
      t.events.groupBy(col("user_id").as("k")).agg(count(lit(1)).as("ne")).cache())
    val ok = graft.core.OwnedCaches.own(
      t.orders.groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("no")).cache())
    val actual = ek.join(ok, "k").agg(sum(col("ne") * col("no")).as("actual_rows"))
    val per = CardBuckets.map { b =>
      val he = ek.groupBy(expr(s"k % $b").as("bkt"))
        .agg(sum(col("ne")).as("re"), count(lit(1)).as("ke"))
      val ho = ok.groupBy(expr(s"k % $b").as("bkt"))
        .agg(sum(col("no")).as("ro"), count(lit(1)).as("ko"))
      he.join(ho, "bkt")
        .agg(sum(expr("(re * ro) div greatest(ke, ko)")).as("est_rows"))
        .select(lit(b).cast("int").as("n_buckets"), col("est_rows"))
    }.reduce(_ unionByName _)
    per.crossJoin(broadcast(actual))
      .selectExpr("n_buckets", "CAST(est_rows AS BIGINT) AS est_rows",
        "CAST(actual_rows AS BIGINT) AS actual_rows",
        "(CAST(est_rows AS DOUBLE) - CAST(actual_rows AS DOUBLE)) / CAST(actual_rows AS DOUBLE) AS err_pct")
      .orderBy("n_buckets")
  }

  val joinCardinalityAuditSql: String = {
    val perB = CardBuckets.map { b =>
      s"""est_$b AS (
         |  SELECT CAST($b AS INTEGER) AS n_buckets,
         |    CAST(sum((re * ro) // greatest(ke, ko)) AS BIGINT) AS est_rows
         |  FROM (SELECT k % $b AS bkt, sum(ne) AS re, count(*) AS ke FROM ek GROUP BY 1) he
         |  JOIN (SELECT k % $b AS bkt, sum(no) AS ro, count(*) AS ko FROM ok GROUP BY 1) ho
         |    USING (bkt))""".stripMargin
    }
    s"""WITH ek AS (
       |  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS ne FROM events GROUP BY 1),
       |ok AS (
       |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS no FROM orders GROUP BY 1),
       |actual AS (
       |  SELECT CAST(sum(ne * no) AS BIGINT) AS actual_rows
       |  FROM ek JOIN ok USING (k)),
       |${perB.mkString(",\n")},
       |per AS (${CardBuckets.map(b => s"SELECT * FROM est_$b").mkString(" UNION ALL ")})
       |SELECT n_buckets, est_rows, actual_rows,
       |  (CAST(est_rows AS DOUBLE) - CAST(actual_rows AS DOUBLE)) / CAST(actual_rows AS DOUBLE) AS err_pct
       |FROM per, actual ORDER BY n_buckets""".stripMargin
  }
}
