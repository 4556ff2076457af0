package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-style `MERGE INTO` semantics as a single declarative plan —
  * the general upsert the reference's notebooks hand-roll with pandas
  * concat/drop_duplicates (e.g. reference `census_etl.py` merge cells),
  * re-expressed as ONE full-outer join + per-column conditional:
  *
  *   - matched  + delete-condition  → row dropped
  *   - matched  (otherwise)         → source values win (update)
  *   - not matched by source        → target row kept unchanged
  *   - not matched by target        → source row inserted
  *
  * Scale shape: one shuffle on the merge key (or zero with a broadcast
  * source — change sets are usually tiny next to the target), then a
  * narrow codegen'd projection. No collect, no iteration; the CDC-merge
  * plan you'd want at 100 TB. AQE handles a skewed merge key.
  */
object Merge {

  /** Merge `source` into `target` on equality of `keyCol`.
    *
    * Contract: `source` must have at most one row per key (the same
    * one-row-per-key contract as [[Scd.scd2]]); duplicate source keys
    * would fan the join out and emit conflicting versions of the same
    * target row. Both frames must share the non-key column set `cols`.
    *
    * @param deleteCond evaluated against SOURCE columns on matched rows;
    *                   a source-only row is always an insert (its delete
    *                   flag is ignored, matching `WHEN MATCHED ... DELETE`).
    */
  def mergeInto(target: DataFrame, source: DataFrame, keyCol: String,
      cols: Seq[String], deleteCond: Column): DataFrame = {
    val t = target.select(keyCol, cols: _*).as("t")
    val s = source.as("s")
    val matched = col(s"s.$keyCol").isNotNull && col(s"t.$keyCol").isNotNull
    t.join(s, col(s"t.$keyCol") === col(s"s.$keyCol"), "full_outer")
      .filter(!(matched && coalesce(deleteCond, lit(false))))
      .select(
        coalesce(col(s"s.$keyCol"), col(s"t.$keyCol")).as(keyCol) +:
          cols.map(c =>
            when(col(s"s.$keyCol").isNotNull, col(s"s.$c"))
              .otherwise(col(s"t.$c")).as(c)): _*)
  }
}
