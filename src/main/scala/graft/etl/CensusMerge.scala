package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Census merge (ref merge_census.py:8-158): full-outer join of the census
  * sheet with the representation rollup, window fills for census-only
  * rows, %-string round-trips, representation status at the configured
  * thresholds, and the final within-demographic ordering.
  *
  * The two join sides are both tiny aggregates (~40 rows each in the
  * reference); a full-outer join cannot broadcast-hash both sides, and at
  * this size the default sort-merge plan is exactly right.
  */
object CensusMerge {

  def merge(census: DataFrame, rollup: DataFrame, silver: DataFrame,
      cfg: SurveyConfig): DataFrame = {
    // renames (merge_census.py:10,17)
    val c = census.withColumnsRenamed(Map(
      "Demographic" -> "Census_Demographic", "Category" -> "Census_Category"))
    val r = rollup.withColumnsRenamed(Map(
      "Demographic" -> "Rollup_Demographic", "Category" -> "Rollup_Category"))
    // full-outer two-key join (merge_census.py:23)
    var df = c.join(r,
      c("Census_Demographic") === r("Rollup_Demographic") &&
        c("Census_Category") === r("Rollup_Category"),
      "full_outer")

    // census-only rows: fill totals from a non-null peer in the same
    // demographic (merge_census.py:29-39). The reference orders this window
    // by the partition key itself, which makes every row a frame peer — the
    // fill may come from ANYWHERE in the partition. Keep that semantics with
    // an explicit full-partition frame (the default RANGE frame would stop
    // at the current row and miss donors that sort later), and order by
    // Census_Category so WHICH donor wins is deterministic.
    val w = Window.partitionBy("Census_Demographic").orderBy("Census_Category")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Each sequential reference block collapses into ONE batched
    // withColumns (§5 driver-side analysis cost — every chained
    // withColumn re-analyzes the whole survey plan beneath this merge;
    // ConstructProbe measured this merge at ~0.34 s of pure driver
    // construction). Within a block every expression reads only the
    // PREVIOUS block's state, exactly as the chained form did.
    val censusOnly = col("Rollup_Demographic").isNull && col("Rollup_Category").isNull
    df = df.withColumns(Map(
      "Total Responses" ->
        when(censusOnly, first(col("Total Responses"), ignoreNulls = true).over(w))
          .otherwise(col("Total Responses")),
      "# of Survey Responses" ->
        when(censusOnly, lit(0)).otherwise(col("# of Survey Responses")),
      "% of Survey Responses" ->
        when(censusOnly, lit("0")).otherwise(col("% of Survey Responses")),
      "Rollup_Demographic" ->
        when(col("Rollup_Demographic").isNull, col("Census_Demographic"))
          .otherwise(col("Rollup_Demographic")),
      "Rollup_Category" ->
        when(col("Rollup_Category").isNull, col("Census_Category"))
          .otherwise(col("Rollup_Category"))))

    // rollup-only rows: null census %, backfill census keys (46-54) —
    // "Census %" reads the pre-backfill census keys, as the chained form
    // did (its withColumn ran before the backfills)
    df = df.withColumns(Map(
      "Census %" ->
        when(col("Census_Demographic").isNull && col("Census_Category").isNull,
          lit(null)).otherwise(col("Census %")),
      "Census_Demographic" ->
        when(col("Census_Demographic").isNull, col("Rollup_Demographic"))
          .otherwise(col("Census_Demographic")),
      "Census_Category" ->
        when(col("Census_Category").isNull, col("Rollup_Category"))
          .otherwise(col("Census_Category"))))

    // census-known, rollup-missing rows (60-68)
    val knownCensusNoRollup = col("Census_Demographic").isNotNull &&
      col("Census_Category").isNotNull && col("Census %").isNotNull &&
      col("Rollup_Demographic").isNull && col("Rollup_Category").isNull
    df = df.withColumns(Map(
      "# of Survey Responses" ->
        when(knownCensusNoRollup, lit(0)).otherwise(col("# of Survey Responses")),
      "% of Survey Responses" ->
        when(knownCensusNoRollup, lit("0 %")).otherwise(col("% of Survey Responses"))))

    // consolidate + drop (73-74)
    df = df.withColumnsRenamed(Map(
      "Census_Demographic" -> "Demographic", "Census_Category" -> "Category"))
      .drop("Rollup_Demographic", "Rollup_Category")

    // %-string strip + float cast (79-80); try_cast for ANSI safety
    df = df.withColumns(Map(
      "Census %" ->
        expr("try_cast(regexp_replace(`Census %`, '%', '') AS float)"),
      "% of Survey Responses" ->
        expr("try_cast(regexp_replace(`% of Survey Responses`, '%', '') AS float)")))

    // % Difference (86-89)
    df = df.withColumn("% Difference",
      when(col("Census %").isNotNull && col("% of Survey Responses").isNotNull,
        col("% of Survey Responses") - col("Census %"))
        .otherwise(lit(null)))

    // representation status CASE at the configured thresholds (95-103)
    df = df.withColumn("Representation Status", expr(
      s"""CASE
         |  WHEN `% Difference` < ${cfg.representationNegative} THEN 'Under-Represented'
         |  WHEN `% Difference` > ${cfg.representationPositive} THEN 'Over-Represented'
         |  WHEN `% Difference` > ${cfg.representationNegative}
         |   AND `% Difference` < ${cfg.representationPositive} THEN 'Looks Good'
         |  ELSE NULL
         |END""".stripMargin))

    // additional responses needed, rounded to nearest 10 (109-114) —
    // the chained second withColumn (nearest-10 rounding of the first)
    // inlines into one expression: round(round(x/10)*10) of the same x
    df = df.withColumn("Additional Responses Needed",
      round(round(
        when(col("Representation Status") === "Under-Represented" ||
          col("Representation Status") === "Over-Represented",
          round(abs(col("% Difference") *
            expr("try_cast(`Total Responses` AS double)") / 100)))
          .otherwise(lit(null)) / 10) * 10))

    // re-format % strings (120-123)
    df = df.withColumns(Map(
      "Census %" ->
        concat(round(col("Census %"), 1).cast("string"), lit("%")),
      "% of Survey Responses" ->
        concat(round(col("% of Survey Responses"), 1).cast("string"), lit("%")),
      "% Difference" ->
        concat(round(col("% Difference"), 1).cast("string"), lit("%"))))
      .withColumnRenamed("Census %", "% of Population (Census)")

    // data-last-updated stamp from silver's max submit date (129-137).
    // A broadcast cross-join of the 1-row aggregate instead of a driver
    // .first(): the stamp stays inside the lazy plan (no extra blocking
    // job), and at scale the max() reduces map-side before the broadcast.
    val maxDate = silver.agg(
      date_format(max(col("Survey Date Submitted")), "MM/dd/yyyy")
        .as("Data Last Updated"))
    df = df.crossJoin(broadcast(maxDate))

    // Final ordering (144-153). The reference materializes a per-
    // demographic row_number and sorts by it; sorting directly on the
    // same key triple is row-identical and saves the window pass — one
    // global range-partitioned sort instead of shuffle+sort+sort.
    df.orderBy(col("Demographic").asc,
        col("Display Order").asc_nulls_last, col("Category").asc)
      .drop("Display Order")
  }
}
