package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions.{normTokens, shingles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication suite (SURVEY.md §2 F) — the operators a
  * 100 TB training-data pipeline runs before anything else.
  *
  * Scale design: every variant avoids the O(n²) cross product.
  *   - exact: one hash-groupBy shuffle on md5(text).
  *   - ngram-jaccard: candidate pairs come from an equi-join on shared
  *     shingles (shuffle keyed by shingle), then exact Jaccard on the
  *     pair counts — work is proportional to actually-colliding pairs.
  *   - minhash-LSH: fixed-width signatures map-side, candidates from an
  *     equi-join on (band, band-hash) buckets — the classic
  *     sub-quadratic near-dup path.
  *   - simhash: 63-bit signature map-side, candidates from 16-bit
  *     chunk buckets (hamming ≤ k must collide on ≥1 of 4 chunks).
  */
object Dedup {

  /** Exact dedup via content-hash groupBy: one row per distinct text,
    * keeper = min doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy("text_hash")

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin

  /** Distinct 3-gram shingle sets per doc: (doc_id, n_shingles, shingle). */
  private def shingleExploded(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))

  /** Exact n-gram Jaccard near-dup pairs (τ = 0.5), candidates blocked
    * by shared shingle. Output is ids + exact set stats, so the oracle
    * is integer-exact.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val a = shingleExploded(spark, dir).toDF("i", "na", "s")
    val b = shingleExploded(spark, dir).toDF("j", "nb", "s2")
    val jac = col("n_common").cast("double") / col("n_union").cast("double")
    a.join(b, col("s") === col("s2") && col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_common"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .select(col("i").as("doc_a"), col("j").as("doc_b"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"))
      .withColumn("jaccard", jac)
      .filter(jac >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  val dedupNgramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> len(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(t) >= 3
      |      THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
      |      ELSE [array_to_string(t, ' ')] END) AS sd
      |  FROM toks),
      |ex AS (SELECT doc_id, len(sd) AS nsh, unnest(sd) AS s FROM sh),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common,
      |         any_value(a.nsh) AS na, any_value(b.nsh) AS nb
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, n_common, na + nb - n_common AS n_union,
      |  CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
      |FROM p
      |WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  private val NumPerms = 64
  private val BandSize = 4 // 16 bands × 4 rows

  /** MinHash signatures + LSH banding → candidate pairs → exact
    * Jaccard verification (τ = 0.5). The hash family (xxhash64 with
    * per-perm salt) isn't reproducible in ANSI SQL → rows-only check;
    * semantics unit-tested against dedupNgramJaccard (LSH must recover
    * the exact pairs).
    */
  def dedupMinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleExploded(spark, dir)
    // per (doc, shingle): 64 salted hashes; then column-wise min per doc
    val sig = sh
      .select(col("doc_id"), col("nsh"),
        posexplode(transform(sequence(lit(0), lit(NumPerms - 1)),
          p => xxhash64(col("s"), p))).as(Seq("perm", "h")))
      .groupBy(col("doc_id"), col("perm"))
      .agg(min(col("h")).as("minh"), first(col("nsh")).as("nsh"))
    // band key = hash of the band's 4 signature values in perm order
    val banded = sig
      .withColumn("band", (col("perm") / BandSize).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(first(col("nsh")).as("nsh"),
        xxhash64(concat_ws(",",
          transform(array_sort(collect_list(struct(col("perm"), col("minh")))),
            s => s.getField("minh").cast("string")))).as("band_key"))
    val left = banded.toDF("i", "band_i", "na", "bk")
    val right = banded.toDF("j", "band_j", "nb", "bk2")
    val candidates = left
      .join(right, col("band_i") === col("band_j") && col("bk") === col("bk2") &&
        col("i") < col("j"))
      .select(col("i"), col("j")).distinct()
    // exact verification on the candidate set only
    val a = shingleExploded(spark, dir).toDF("i", "na", "s")
    val b = shingleExploded(spark, dir).toDF("j", "nb", "s2")
    val pairStats = a.join(b, col("s") === col("s2") && col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_common"), first(col("na")).as("na"), first(col("nb")).as("nb"))
    val jac = col("n_common").cast("double") / (col("na") + col("nb") - col("n_common"))
    candidates.join(pairStats, Seq("i", "j"))
      .withColumn("jaccard", jac)
      .filter(jac >= 0.5)
      .select(col("i").as("doc_a"), col("j").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 63-bit SimHash near-dup pairs (hamming ≤ 8), candidates blocked on
    * 16-bit signature chunks. xxhash64-based → rows-only check +
    * unit tests.
    */
  def dedupSimHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tok = docs.select(col("doc_id"), explode(array_distinct(normTokens(col("text")))).as("tok"))
    val bits = tok
      .select(col("doc_id"), xxhash64(col("tok")).as("h"),
        explode(sequence(lit(0), lit(62))).as("bit"))
      .withColumn("contrib",
        when(expr("shiftright(h, CAST(bit AS INT))").bitwiseAND(1) === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("contrib")).as("w"))
    val sigs = bits
      .withColumn("bitval", when(col("w") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bitval")).as("simhash"))
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, CAST(c * 16 AS INT))").bitwiseAND(0xFFFF))
    val l = chunked.toDF("i", "sh_i", "c_i", "chunk_i")
    val r = chunked.toDF("j", "sh_j", "c_j", "chunk_j")
    l.join(r, col("c_i") === col("c_j") && col("chunk_i") === col("chunk_j") &&
        col("i") < col("j"))
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        bit_count(col("sh_i").bitwiseXOR(col("sh_j"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }
}
