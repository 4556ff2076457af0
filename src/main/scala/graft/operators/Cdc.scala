package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two table snapshots — the diff a
  * warehouse computes to ship a day's changes downstream instead of the
  * whole table (the reference re-extracts and overwrites full tables,
  * ref utils.py:124-142; at 100 TB the delta IS the product).
  *
  * Scale shape: ONE full-outer join on the key and a narrow classify
  * projection — the same single-shuffle shape as [[Scd.scd2]]. Unchanged
  * rows are dropped before anything downstream sees them, so the output
  * is delta-sized no matter how big the snapshots are. When one snapshot
  * is much smaller (e.g. diffing against yesterday's partition subset),
  * Catalyst broadcasts it.
  */
object Cdc {

  /** Diff `newDf` against `oldDf` by `keyCol`.
    *
    * @param valueCols columns compared null-safely to detect updates
    * @return one row per changed key: `op` ∈ I (insert: key only in
    *         new), D (delete: key only in old), U (update: both present,
    *         any value column differs), with `old_<c>` / `new_<c>` value
    *         pairs. Unchanged keys are omitted. Both snapshots must be
    *         key-unique (a snapshot with duplicate keys is not a
    *         snapshot).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    val o = oldDf.select((col(keyCol) +:
      valueCols.map(c => col(c).as(s"__o_$c")) :+
      lit(true).as("__in_o")): _*)
    val n = newDf.select((col(keyCol) +:
      valueCols.map(c => col(c).as(s"__n_$c")) :+
      lit(true).as("__in_n")): _*)
    val changed = valueCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__in_o").isNull, "I")
          .when(col("__in_n").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select((col("op") +: col(keyCol) +: valueCols.flatMap(c => Seq(
        col(s"__o_$c").as(s"old_$c"), col(s"__n_$c").as(s"new_$c")))): _*)
  }
}
