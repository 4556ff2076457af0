package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file hygiene for large tables: the small-files problem (a 32k-
  * partition shuffle writing 32k tiny parquet files) degrades every
  * downstream scan — footer reads, task scheduling, object-store listing
  * all scale with file COUNT, not bytes.
  *
  * Two levers, composable:
  *  - cap file count: `coalesce` (narrow — merges partitions without a
  *    shuffle) when reducing, `repartition` when the data must also
  *    rebalance;
  *  - cap file size: `maxRecordsPerFile` splits oversized partitions at
  *    write time without any plan change.
  */
object Compaction {

  /** Write with a bounded file count. `rebalance = false` (default) uses
    * coalesce — no shuffle, but skewed partitions stay skewed;
    * `rebalance = true` pays one round-robin shuffle for even files. */
  def writeCompacted(
      df: DataFrame, path: String, numFiles: Int,
      maxRecordsPerFile: Long = 0L, rebalance: Boolean = false): Unit = {
    val sized = if (rebalance) df.repartition(numFiles) else df.coalesce(numFiles)
    val w = sized.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(path)
  }
}
