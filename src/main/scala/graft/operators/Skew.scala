package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.money
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
