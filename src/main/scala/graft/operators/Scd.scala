package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension upserts — the MERGE-shaped maintenance op a
  * warehouse runs against its dimensions. The reference keeps its tables
  * in a format whose `MERGE INTO` does this transactionally
  * (ref `utils.py:139` sets delta table properties); on plain parquet the
  * equivalent is a deterministic full-outer merge producing the new table
  * version, then an atomic overwrite (see [[graft.sources.TableSink]]).
  * This operator is that merge, Type-2 flavored: history rows are closed
  * rather than overwritten, so every key keeps its full version chain.
  *
  * Scale shape: ONE full-outer join on the key (updates are typically a
  * day's delta — Catalyst broadcasts them when small; at parity the join
  * shuffles both sides by key once) followed by a narrow union of the
  * closed-history and new-version projections. Nothing corpus-sized is
  * collected or iterated.
  */
object Scd {

  /** Apply an SCD Type-2 upsert.
    *
    * @param target    current dimension snapshot; must carry `keyCol`,
    *                  `carryCols` and `trackCols`
    * @param updates   change set; must carry `keyCol`, `trackCols` (the
    *                  NEW values) and `effDateCol` (version boundary,
    *                  string yyyy-MM-dd)
    * @param carryCols identity columns copied from the target (null on
    *                  rows inserted for brand-new keys)
    * @param trackCols columns whose history is versioned
    * @param initDate  valid_from stamped on the pre-existing version
    * @return one row per (key, version): pre-existing versions get
    *         `valid_to` = the update's effective date (null when never
    *         updated, `is_current` = true); updated/inserted keys add a
    *         current row with the new values
    *
    * Change-set contract: ONE row per key. A change set carrying duplicate
    * keys would otherwise fan the full-outer join out — multiple "closed"
    * copies of the same pre-existing version and multiple is_current rows
    * per key — so duplicates are resolved latest-wins here (max
    * `effDateCol` per key, ties broken on the tracked values) before the
    * join, matching MERGE semantics where the newest statement of a row
    * wins. To apply several change sets as a full version CHAIN, use
    * [[applyBatches]] instead.
    */
  def scd2(target: DataFrame, updates: DataFrame, keyCol: String,
      carryCols: Seq[String], trackCols: Seq[String],
      effDateCol: String, initDate: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((col(effDateCol).desc +: trackCols.map(col(_).desc)): _*)
    val u = updates
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(
        (col(keyCol) +: trackCols.map(c => col(c).as(s"__u_$c")) :+
          col(effDateCol).as("__eff")): _*)
      .withColumn("__u", lit(true))
    val t = target.withColumn("__t", lit(true))
    val joined = t.join(u, Seq(keyCol), "full_outer")
    val closed = joined.filter(col("__t"))
      .select((col(keyCol) +: (carryCols ++ trackCols).map(col) :+
        lit(initDate).as("valid_from") :+
        col("__eff").as("valid_to") :+
        col("__u").isNull.as("is_current")): _*)
    val fresh = joined.filter(col("__u"))
      .select((col(keyCol) +: carryCols.map(col) ++:
        trackCols.map(c => col(s"__u_$c").as(c)) :+
        col("__eff").as("valid_from") :+
        lit(null).cast("string").as("valid_to") :+
        lit(true).as("is_current")): _*)
    closed.unionByName(fresh)
  }

  /** Fold N change sets into one full SCD2 version chain.
    *
    * Applying `scd2` N times would run N joins and rewrite the dimension
    * N times; at warehouse scale the chain is built in ONE pass instead:
    * every version (the target's initial state plus every batch's
    * restatement) unions into a single frame, and a per-key LEAD window
    * over the effective date closes each version with its successor's
    * start. Batches are ordered: when two batches restate the same key at
    * the SAME effective date, the later batch wins (the same
    * latest-statement-wins contract as [[scd2]]'s within-batch dedupe).
    *
    * Scale shape: the delta-sized carry join, a narrow union of base and
    * restated versions, then ONE dimension-sized shuffle by key. The
    * same-eff dedupe and the LEAD chain run as two window passes over
    * that single exchange: both partition by `keyCol`, and the first
    * pass's (eff, batch desc) sort satisfies the second's (eff) prefix,
    * so Catalyst inserts no further exchange or sort (pinned in
    * `ScdSpec`).
    *
    * @return one row per (key, version): `valid_from` = the version's
    *         effective date (`initDate` for the pre-existing state),
    *         `valid_to` = the next version's effective date (null on the
    *         final version, `is_current` = true). Brand-new keys start
    *         their chain at their first restatement with null carry
    *         columns.
    */
  def applyBatches(target: DataFrame, batches: Seq[DataFrame], keyCol: String,
      carryCols: Seq[String], trackCols: Seq[String],
      effDateCol: String, initDate: String): DataFrame = {
    require(batches.nonEmpty, "applyBatches: no change sets")
    val tagged = batches.zipWithIndex.map { case (b, i) =>
      b.select((col(keyCol) +: trackCols.map(col) :+
        col(effDateCol).as("__eff")): _*)
        .withColumn("__batch", lit(i))
    }.reduce(_ unionByName _)
    applyTaggedBatches(target, tagged, keyCol, carryCols, trackCols,
      "__eff", "__batch", initDate)
  }

  /** [[applyBatches]] for callers that derive ALL change sets from one
    * scan of the same fact table: `tagged` carries the batch sequence
    * position as a column (`batchCol`, int ≥ 0, later batch wins same-eff
    * ties) alongside `keyCol`, `trackCols` and `effDateCol`, so N batches
    * need ONE source scan instead of the N filtered re-scans
    * [[applyBatches]] unions. Semantics are identical — [[applyBatches]]
    * delegates here after tagging each frame with its position. */
  def applyTaggedBatches(target: DataFrame, tagged0: DataFrame, keyCol: String,
      carryCols: Seq[String], trackCols: Seq[String],
      effDateCol: String, batchCol: String, initDate: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = tagged0.select((col(keyCol) +: trackCols.map(col) :+
      col(effDateCol).as("__eff") :+ col(batchCol).as("__batch")): _*)
    val carrySrc = target.select((col(keyCol) +: carryCols.map(col)): _*)
    val fresh = tagged.join(carrySrc, Seq(keyCol), "left")
      .select((col(keyCol) +: carryCols.map(col) ++:
        trackCols.map(col) :+ col("__eff") :+ col("__batch")): _*)
    // the base version carries __batch = -1 so a restatement AT initDate
    // outranks it in the latest-wins dedupe below
    val base = target.select((col(keyCol) +: carryCols.map(col) ++:
      trackCols.map(col) :+ lit(initDate).as("__eff") :+
      lit(-1).as("__batch")): _*)
    // Two window passes over ONE exchange: both partition by the key, and
    // the dedupe sort (eff, batch desc) satisfies the chain sort (eff) as
    // a prefix, so the LEAD pass adds no exchange and no sort. Dedupe
    // keeps the first row of each same-eff run = the latest batch.
    val wDedup = Window.partitionBy(col(keyCol))
      .orderBy(col("__eff"), col("__batch").desc)
    val wChain = Window.partitionBy(col(keyCol)).orderBy(col("__eff"))
    base.unionByName(fresh)
      .withColumn("__prev_eff", lag(col("__eff"), 1).over(wDedup))
      .filter(col("__prev_eff").isNull || col("__prev_eff") =!= col("__eff"))
      .withColumn("valid_from", col("__eff"))
      .withColumn("valid_to", lead(col("__eff"), 1).over(wChain))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__eff", "__batch", "__prev_eff")
  }
}
