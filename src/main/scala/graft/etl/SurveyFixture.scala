package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic survey-shaped frame derived from the `orders` fixture —
  * the flagship input: every Silver recode branch and Is_Invalid branch is
  * hit by construction (modular arithmetic on the order key), and the same
  * derivation is expressible in ANSI SQL for the DuckDB oracle.
  */
object SurveyFixture {

  val TimestampFmt = "MM/dd/yyyy h:mm:ss a"

  def fromOrders(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val likertVals = Seq(
      "No change", "A little better", "A lot better",
      "A little worse", "A lot worse", "Something else")
    val likertCols = SurveyConfig.kingston.likertColumns.zipWithIndex.map {
      case (name, i) =>
        // 7 cases: 6 vocabulary values + null
        val idx = (k + lit(i * 3)) % 7
        likertVals.zipWithIndex
          .foldLeft(when(idx === 6, lit(null).cast("string"))) {
            case (acc, (v, j)) => acc.when(idx === j, v)
          }.as(name)
    }
    orders.select(Seq(
      k.cast("string").as("Response ID"),
      when(col("o_orderstatus") === "F", "Complete")
        .when(col("o_orderstatus") === "O", "Partial")
        .otherwise("Disqualified").as("Survey Completed?"),
      when(k % 53 === 0, "ok").as("Alchemer Admin Comments"),
      when(col("o_custkey") % 97 === 0, "Test link")
        .otherwise("Live link").as("Survey Link Used"),
      when(col("o_custkey") % 31 === 0, "Canada")
        .otherwise("United States").as("IP Address - Country"),
      when(k % 7 === 0, "Prefer not to say")
        .when(k % 7 === 1, "Write In")
        .when(k % 7 === 2, "Male")
        .when(k % 7 === 3, "Female")
        .when(k % 7 === 4, "Non-binary")
        .otherwise(lit(null).cast("string")).as("Gender"),
      (k % 140 - 10).cast("int").cast("string").as("Age"),
      when(k % 5 === 0, "Yes").otherwise("No").as("Hispanic or Latinx"),
      when(k % 6 === 0, "Some other race (please write it in here)")
        .when(k % 6 === 1, "I prefer not to answer this question")
        .when(k % 6 === 2, "White")
        .when(k % 6 === 3, "Black or African American")
        .otherwise(lit(null).cast("string")).as("Race/Ethnicity"),
      when(k % 4 === 0, "Less than $20,000")
        .when(k % 4 === 1, "$20,000 to $49,999")
        .when(k % 4 === 2, "$50,000 to $99,999")
        .otherwise("I prefer not to answer this question").as("Household Income"),
      when(col("o_custkey") % 3 === 0, "English")
        .otherwise("Spanish").as("Survey Language"),
      when(col("o_custkey") % 11 === 0, lit(""))
        .when(col("o_custkey") % 11 === 1, lit(null).cast("string"))
        .otherwise(concat(lit("CM "), (col("o_custkey") % 4).cast("string")))
        .as("CM Name"),
      date_format(col("o_orderdate"), TimestampFmt).as("Time Started"),
      date_format(col("o_orderdate") + expr("INTERVAL 25 MINUTES"), TimestampFmt)
        .as("Survey Date Submitted")
    ) ++ likertCols: _*)
  }

  /** Census-sheet-shaped frame derived from nation⋈region: Demographic =
    * "Language" / "Gender" slices with Census % strings and Display Order,
    * including rows the rollup won't have (census-only) and omitting rows
    * the rollup will have (rollup-only) — both outer-join sides exercised.
    */
  def censusFromFixtures(nation: DataFrame): DataFrame =
    nation.filter(col("n_nationkey") < 8).select(
      when(col("n_nationkey") % 2 === 0, "Language").otherwise("Gender")
        .as("Demographic"),
      when(col("n_nationkey") === 0, "English")
        .when(col("n_nationkey") === 2, "Spanish")
        .when(col("n_nationkey") === 4, "French") // census-only category
        .when(col("n_nationkey") === 6, "Unknown")
        .when(col("n_nationkey") === 1, "Male")
        .when(col("n_nationkey") === 3, "Female")
        .when(col("n_nationkey") === 5, "Other")
        .otherwise("Unknown").as("Category"),
      concat(((col("n_nationkey") + 1) * 10).cast("string"), lit("%"))
        .as("Census %"),
      when(col("n_nationkey") % 3 === 0, col("n_nationkey").cast("int"))
        .otherwise(lit(null).cast("int")).as("Display Order"))
}
