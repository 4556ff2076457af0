package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold rollup (ref rollup_alchemer_data.py:17-48 + utils.py:190-223):
  * valid/invalid split and the per-demographic representation rollup.
  *
  * Scale rewrite: the reference issues TWO collect()s per demographic for
  * the scalar totals (utils.py:207-211 — 12+ job launches). Here the
  * totals are unpartitioned window aggregates OVER THE POST-AGGREGATION
  * frame (≤ #categories rows, tiny by construction), so each demographic
  * is one job and zero driver round-trips, with identical output.
  */
object Gold {

  def validSplit(silver: DataFrame): (DataFrame, DataFrame) = (
    silver.filter(col("Is_Invalid") === "Valid"),
    silver.filter(col("Is_Invalid") =!= "Valid"))

  /** One demographic rollup (ref utils.py:190-223). The window is
    * unpartitioned by design: it runs on the grouped result (one row per
    * category), not on raw responses. */
  def processDemographic(
      valid: DataFrame, demographicCol: String, demographicName: String): DataFrame = {
    val counts = valid.groupBy(col(demographicCol).as("Category"))
      .agg(count(lit(1)).as("count"))
    val w = Window.partitionBy(lit(1))
    // total excluding "Unknown" (utils.py:210-211); null categories fail
    // the =!= null-safely and are excluded, matching the reference filter
    val totalExcl = sum(when(col("Category") =!= "Unknown", col("count"))).over(w)
    counts
      .withColumn("Demographic", lit(demographicName))
      .withColumn("Total Responses",
        when(col("Category") =!= "Unknown", totalExcl.cast("string"))
          .otherwise(lit("")))
      .withColumn("% of Survey Responses",
        format_string("%.2f%%", col("count") / totalExcl * 100))
      .withColumnRenamed("count", "# of Survey Responses")
      .orderBy(col("Category").desc)
  }

  val FinalColumns: Seq[String] = Seq(
    "Demographic", "Category", "# of Survey Responses",
    "% of Survey Responses", "Total Responses")

  /** All-demographic rollup (ref rollup_alchemer_data.py:29-41) in a
    * SINGLE pass. The reference (and `processDemographic`) scans the valid
    * set once per demographic — 6 full scans + 6 shuffles. Here each row
    * explodes into its 6 (demographic, category) pairs, one groupBy
    * aggregates them all, and one window partitioned by demographic
    * computes the excluding-Unknown totals: one scan, one shuffle on
    * (demographic, category), one tiny window over ≤ #categories rows per
    * demographic — the shape that survives a 100 TB valid set. Row content
    * is identical to unioning `processDemographic` over cfg.demographics. */
  def rollup(valid: DataFrame, cfg: SurveyConfig): DataFrame = {
    val pairs = array(cfg.demographics.map { case (c, name) =>
      struct(lit(name).as("Demographic"), col(c).cast("string").as("Category"))
    }: _*)
    val counts = valid
      .select(explode(pairs).as("p"))
      .groupBy(col("p.Demographic").as("Demographic"),
        col("p.Category").as("Category"))
      .agg(count(lit(1)).as("count"))
    val w = Window.partitionBy("Demographic")
    val totalExcl = sum(when(col("Category") =!= "Unknown", col("count"))).over(w)
    counts
      .withColumn("Total Responses",
        when(col("Category") =!= "Unknown", totalExcl.cast("string"))
          .otherwise(lit("")))
      .withColumn("% of Survey Responses",
        format_string("%.2f%%", col("count") / totalExcl * 100))
      .withColumnRenamed("count", "# of Survey Responses")
      .select(FinalColumns.map(col): _*)
  }
}
