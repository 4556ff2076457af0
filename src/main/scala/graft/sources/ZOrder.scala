package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of two dimension
  * keys and range-sort the table by the interleaved value, so on-disk
  * min/max statistics become selective on BOTH dimensions at once. A
  * linear sort gives perfect skipping on its leading column and none on
  * any other; the z-curve trades a little of the first dimension's
  * locality for skipping on all interleaved dimensions — the standard
  * layout for "filter by either of two keys" scans at 100 TB (the same
  * technique transactional table formats expose as `OPTIMIZE ZORDER BY`).
  *
  * Scale shape: one bounded min/max aggregate per dimension (a driver-side
  * model artifact, like the ANN codebooks), one narrow bit-interleave
  * projection (codegen'd shifts/adds on non-overlapping bits), and ONE
  * range exchange for the total sort — the exchange every total-ordering
  * write pays. File granularity is capped with `maxRecordsPerFile`, so
  * each output file's footer min/max spans a small z-range and scan-time
  * pruning (file- or row-group-level) can drop most of the layout for a
  * range predicate on either dimension. `ZOrderSpec` measures exactly
  * that: the fraction of files a mid-range predicate intersects under
  * z-order vs a linear sort.
  */
object ZOrder {

  /** Morton interleave of two already-bucketed non-negative columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. The terms
    * occupy disjoint bits, so plain addition assembles the word. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorder: bits $bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Min-max bucketing of a long key into [0, 2^bits): the linear rescale
    * is monotonic, so range predicates on the raw key stay range
    * predicates on the bucket. Degenerate (constant) dimensions collapse
    * to bucket 0.
    *
    * The rescale goes through DOUBLE division: the integer form
    * `(c - mn) * (2^bits - 1) / (mx - mn)` overflows the long multiply
    * once the key range exceeds ~Long.Max/2^bits (an epoch-nanos key
    * spanning years) — an ANSI ArithmeticException at write time. The
    * normalized ratio is in [0, 1] and bits ≤ 31, so the double path
    * loses nothing representable in the bucket. */
  def bucket(c: Column, mn: Long, mx: Long, bits: Int): Column =
    if (mx <= mn) lit(0L)
    else floor(
      (c.cast("long") - mn).cast("double") / (mx - mn).toDouble *
        ((1L << bits) - 1).toDouble).cast("long")

  /** The z-value column for two long-typed dimension columns of `df`,
    * with the min/max normalization bounds computed in one bounded
    * aggregate. */
  def zValue(df: DataFrame, dimA: String, dimB: String, bits: Int): Column = {
    val r = df.agg(
      min(col(dimA).cast("long")), max(col(dimA).cast("long")),
      min(col(dimB).cast("long")), max(col(dimB).cast("long"))).head()
    require(!r.anyNull, s"zorder: empty input or null keys in $dimA/$dimB")
    interleaveBits(
      bucket(col(dimA), r.getLong(0), r.getLong(1), bits),
      bucket(col(dimB), r.getLong(2), r.getLong(3), bits), bits)
  }

  /** Write `df` z-ordered by (dimA, dimB) to `path`, capping file size so
    * footer statistics stay selective. Returns the file count. */
  def writeZOrdered(df: DataFrame, dimA: String, dimB: String, path: String,
      bits: Int = 12, maxRecordsPerFile: Long = 20000L): Int = {
    df.withColumn("__z", zValue(df, dimA, dimB, bits))
      .orderBy("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
    df.sparkSession.read.parquet(path).inputFiles.length
  }
}
