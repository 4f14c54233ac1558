package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered layout for multi-dimensional data
  * skipping (SURVEY.md §2 L) — the physical-layout move behind
  * "cluster by (a, b)" in modern lakehouse writers: interleave the
  * bits of two sort keys so that range-partitioned, sorted files are
  * simultaneously LOCAL in both dimensions, and parquet min/max
  * footer stats prune scans filtered on EITHER column. A single-column
  * sort gives perfect pruning on that column and none on the other;
  * the Z-curve trades a little of each for usable pruning on both —
  * the right default for a 100 TB fact table queried by both
  * user and time.
  *
  * The interleave is the classic bit-spreading multiply-mask ladder as
  * STATIC column expressions (5 shift/mask steps per key, fully
  * codegen'd, no UDF) — reference pattern e.g. the public
  * "Bit Twiddling Hacks" interleave-by-binary-magic-numbers.
  */
object ZOrder {

  private val Masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 31 bits of a non-negative long so consecutive bits
    * land 2 apart (positions 0,2,4,…,60). Only 31 bits per dimension:
    * a 32nd bit on the odd-position key would land on bit 63 — the
    * SIGN bit — making large keys sort NEGATIVE and range-partition
    * before all small ones, silently destroying the curve's locality.
    */
  private def spread(c: Column): Column =
    Masks.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) { case (x, (s, m)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 62-bit Morton key of two non-negative 31-bit values: bits of `a`
    * on even positions, bits of `b` on odd. Monotone in neither input
    * alone — locality in both together, which is the point. Inputs
    * must be pre-normalized to 0..2^31−1 (see [[writeZOrdered]]);
    * higher bits are masked off, so an un-normalized 32-bit column
    * wraps rather than flipping the key's sign.
    */
  def zorderValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Write `df` parquet clustered on the Z-curve of (`a`, `b`):
    * range-partition on the Morton key into `numFiles` files, sort
    * within each, drop the key before writing. Readers filtering on
    * either column skip files via footer min/max stats.
    *
    * Callers must pre-normalize both columns to COMPARABLE non-negative
    * ranges (rank or min-max bucket them, to 0..2^k with k ≤ 31): with unequal
    * bit widths the wider dimension's high bits own the top of the
    * curve and the layout degenerates to a single-column sort — the
    * unit test demonstrates both the pre-step and the failure mode it
    * avoids.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int): Unit =
    df.withColumn("_zorder", zorderValue(col(a).cast("long"), col(b).cast("long")))
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("overwrite").parquet(path)
}
