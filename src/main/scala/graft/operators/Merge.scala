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
  /** Versioned CDC apply — the CONFLUENT merge: state ∪ batch reduced
    * to the highest-version record per key (`row_number` over version
    * desc). Unlike [[mergeInto]], which assumes ordered one-row-per-key
    * change sets, this absorbs out-of-order and re-delivered changes:
    * the reduction is commutative, associative, and idempotent, so the
    * final state is independent of how a stream chops the change log
    * into micro-batches (MergeSpec pins one-batch ≡ two-batch ≡
    * reversed). Delete tombstones (`opCol = 'D'`) stay IN the state so
    * a late lower-version update cannot resurrect a deleted key —
    * readers filter them; compaction can drop a tombstone once the
    * version low-watermark passes it. The Kafka-compaction /
    * sequence-field merge-on-read recipe, as one window over the union.
    *
    * Ties on (key, version) are broken op-desc ('U' > 'D': an upsert
    * and its own re-delivery dedup; a same-version U/D conflict is a
    * producer bug we resolve deterministically toward keeping data). */
  def applyVersioned(state: DataFrame, batch: DataFrame,
      keyCol: String, versionCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    state.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

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
