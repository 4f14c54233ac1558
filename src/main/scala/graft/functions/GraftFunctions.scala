package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level building blocks, composed exclusively from
  * `org.apache.spark.sql.functions` so everything stays inside
  * whole-stage codegen (no UDFs).
  */
object GraftFunctions {

  /** dbt-utils–style surrogate key (reference:
    * `dbt-project-glamira/models/dimensions/dim_customer.sql:11` and
    * siblings use `dbt_utils.generate_surrogate_key`): md5 over the
    * dash-joined,
    * null-coalesced string casts of the key columns. Deterministic and
    * reproducible in any ANSI engine — the same expression is used in
    * the DuckDB oracles.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit("_null_"))): _*))

  /** Exact-arithmetic money column: cast a double measure to
    * decimal(18,2) so downstream sums are order-independent (bit-exact
    * across engines and across shuffle schedules — a correctness
    * requirement at 1000-executor scale where reduction order is
    * nondeterministic).
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Parse locale-formatted price strings into decimal(18,2).
    * Handles both `"5.165,00 €"` (EU: dot thousands, comma decimals —
    * the format the reference's product crawler scrapes, reference:
    * `5.data-collection-storage/product_crawler.py:260-262`
    * parse_price) and `"$1,234.56"` (US). Pure regexp composition —
    * codegen'd.
    */
  def parsePrice(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9.,]", "")
    // a comma is a DECIMAL separator only when it is the last
    // separator and is followed by 1-2 trailing digits ("12,50",
    // "5.165,00"); a trailing 3-digit comma group ("1,299") is
    // thousands grouping. (The mirrored "1.299" ambiguity resolves to
    // a US decimal, matching crawler conventions.)
    val isEu = digits.rlike(",\\d{1,2}$")
    val normalized = when(isEu, regexp_replace(regexp_replace(digits, "\\.", ""), ",", "."))
      .otherwise(regexp_replace(digits, ",", ""))
    when(length(normalized) > 0, normalized.cast(DecimalType(18, 2)))
  }

  /** Currency code from a raw price string: ISO code if present, else
    * mapped from the symbol (reference crawls `€`-suffixed prices).
    */
  def parseCurrency(c: Column): Column = {
    val iso = regexp_extract(c, "([A-Z]{3})", 1)
    when(length(iso) > 0, iso)
      .when(c.contains("€"), lit("EUR"))
      .when(c.contains("$"), lit("USD"))
      .when(c.contains("£"), lit("GBP"))
      .otherwise(lit(null).cast("string"))
  }

  /** `"4.8 Sterne"` / `"4.8 stars"` → 4.8 (reference: product_crawler
    * rating_raw → rating).
    */
  def parseRating(c: Column): Column = {
    val m = regexp_extract(c, "([0-9]+(?:\\.[0-9]+)?)", 1)
    when(length(m) > 0, m.cast(DecimalType(4, 2)))
  }

  /** Cosine similarity between two float-array columns, computed in
    * double precision with an index-ordered sequential sum (matches a
    * single-threaded reference implementation bit-for-bit). Stays in
    * codegen via higher-order functions — no UDF.
    */
  def cosineSim(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Whitespace tokens of lowercased text with punctuation stripped —
    * shared normalization for the text-analysis and dedup operators.
    *
    * NOTE: when the token array feeds several downstream expressions
    * (or a per-element lambda), materialize it with `.withColumn`
    * first — Catalyst duplicates the whole tokenization subtree at
    * every reference site otherwise, turning O(row) work into
    * O(row × references).
    */
  def normTokens(c: Column): Column =
    filter(split(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +"), t => length(t) > 0)

  /** Distinct word n-gram shingles from a (materialized) token-array
    * column.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Word n-gram shingles (sorted distinct) of normalized text.
    * Prefer `normTokens` → `.withColumn` → `shinglesFromTokens` in hot
    * paths (see normTokens note).
    */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(normTokens(c), n)
}
