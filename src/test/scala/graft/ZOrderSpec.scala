package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Measures the thing z-ordering exists for: how many files a range
  * predicate has to touch, by footer min/max, under the z-layout vs a
  * linear sort. File-level min/max intersection is exactly the pruning
  * rule scan-time skipping (parquet row groups, external file indexes)
  * applies. */
class ZOrderSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** Two pseudo-independent uniform dimensions. */
  private def data = spark.range(1 << 16).select(
    pmod(hash(col("id")), lit(100000)).cast("long").as("a"),
    pmod(hash(col("id") + 999983), lit(100000)).cast("long").as("b"))

  /** Fraction of files whose [min,max] on `dim` intersects [lo, hi]. */
  private def touchedFraction(path: String, dim: String, lo: Long, hi: Long): Double = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
      .select("mn", "mx").collect()
    assert(stats.length >= 16, s"want many files for a meaningful measure, got ${stats.length}")
    stats.count(r => r.getLong(1) >= lo && r.getLong(0) <= hi).toDouble / stats.length
  }

  test("z-order layout skips on BOTH dimensions; linear sort only on its leading one") {
    val zPath = tmp("zorder")
    val nFiles = ZOrder.writeZOrdered(data, "a", "b", zPath,
      bits = 12, maxRecordsPerFile = 2048)
    assert(nFiles >= 16)
    val linPath = tmp("linear")
    data.orderBy("a").write.mode("overwrite")
      .option("maxRecordsPerFile", 2048L).parquet(linPath)

    // mid-range 5% slab on each dimension
    val (lo, hi) = (47500L, 52500L)
    val zA = touchedFraction(zPath, "a", lo, hi)
    val zB = touchedFraction(zPath, "b", lo, hi)
    val linA = touchedFraction(linPath, "a", lo, hi)
    val linB = touchedFraction(linPath, "b", lo, hi)

    // the linear layout is perfect on its own key and blind on the other
    assert(linA <= 0.2, s"linear layout should skip on its sort key, touched $linA")
    assert(linB >= 0.9, s"linear layout cannot skip on the other key, touched $linB")
    // the z-layout skips on BOTH. The mid-range slab deliberately crosses
    // the curve's most-significant-bit split — z-order's worst case — so
    // the bound on the minor-interleaved dimension (a) is looser: even
    // at the worst alignment a third of the files drop, where the linear
    // layout drops none on its non-sort key.
    assert(zB <= 0.6, s"z-order failed to skip on dim b: touched $zB")
    assert(zA <= 0.7, s"z-order failed to skip on dim a: touched $zA")
    assert(zB < linB / 2,
      s"z-order ($zB) should touch < half the files the linear layout does ($linB) on dim b")
  }

  test("degenerate inputs: constant dimension collapses, empty input fails fast") {
    import org.apache.spark.sql.functions.lit
    val const = spark.range(100).select(
      lit(7L).as("a"), org.apache.spark.sql.functions.col("id").as("b"))
    val p = tmp("zconst")
    // constant dim buckets to 0 everywhere — the layout degrades to a
    // linear sort on b, never a failure
    ZOrder.writeZOrdered(const, "a", "b", p, bits = 8, maxRecordsPerFile = 10)
    assert(spark.read.parquet(p).count() == 100)
    intercept[IllegalArgumentException] {
      ZOrder.zValue(spark.range(0).selectExpr("id as a", "id as b"), "a", "b", 8)
    }
  }

  test("z-value interleave is monotone in each bucketed dimension block") {
    // bit-level sanity: interleaving known small values
    val df = spark.range(1).select(
      ZOrder.interleaveBits(lit(0L), lit(0L), 4).as("z00"),
      ZOrder.interleaveBits(lit(1L), lit(0L), 4).as("z10"),
      ZOrder.interleaveBits(lit(0L), lit(1L), 4).as("z01"),
      ZOrder.interleaveBits(lit(3L), lit(3L), 4).as("z33"))
    val r = df.head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1L)  // bit 0 of a → position 0
    assert(r.getLong(2) == 2L)  // bit 0 of b → position 1
    assert(r.getLong(3) == 15L) // 0b1111
  }
}
