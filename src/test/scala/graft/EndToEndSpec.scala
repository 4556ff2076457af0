package graft

import graft.etl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FIXTURES.md §B: the authored survey CSVs through the whole pipeline —
  * bronze CSV ingest + config-driven renames, silver scrubs/recodes/flag,
  * gold rollup, census merge — asserted against hand-computed goldens. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def readCsv(name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(res(name))

  private lazy val cfg = {
    val renames = readCsv("config_renames.csv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val drops = readCsv("config_drops.csv").collect().map(_.getString(0)).toSeq
    val openText = readCsv("config_open_text.csv").collect()
      .map(_.getString(0)).toSeq
    SurveyConfig.kingston.copy(
      colsToRename = renames, colsToDelete = drops, openTextFields = openText)
  }

  private lazy val silver: DataFrame = Silver.transform(
    Bronze.ingest(readCsv("survey_online.csv"), readCsv("survey_offline.csv"), cfg),
    cfg)

  test("bronze: renames applied, offline ids prefixed, exclusive cols null-padded") {
    assert(silver.columns.contains("Gender"))
    assert(!silver.columns.contains("Q5: Gender"))
    assert(!silver.columns.contains("Internal Notes"))
    val offline = silver.filter(col("Response ID").startsWith("Offline #"))
    assert(offline.count() == 2)
    assert(offline.filter(col("Time Started").isNotNull).count() == 0)
  }

  test("silver: zip truncation, mojibake repair, null-phrase scrub goldens") {
    val byId = silver.collect().map(r =>
      r.getAs[String]("Response ID") -> r).toMap
    assert(byId("1").getAs[String]("IP Address - Zip Code") == "12345")
    assert(byId("8").getAs[String]("IP Address - Zip Code") == "Unknown")
    assert(byId("9").getAs[String]("IP Address - Zip Code") == "abcde")
    val open = "Open Text: What would make things better?"
    assert(byId("2").getAs[String](open) == "it's fine i")
    assert(byId("1").getAs[String](open) == null) // "No comment"
    assert(byId("8").getAs[String](open) == "not really") // typo keeps it
    assert(byId("9").getAs[String](open) == null) // literal nan
    assert(byId("10").getAs[String](open) == null) // "N/A!" → "na"
    assert(byId("2").getAs[Int]("Safety: Impact my safety") == 0) // junk → 0
    assert(byId("8").getAs[Int]("Safety: Impact my safety") == -2)
    // duration: row 10 spans 40 minutes
    assert(byId("10").getAs[Double]("Time Difference (Minutes)") == 40.0)
  }

  test("silver: Is_Invalid goldens across every branch") {
    val flags = silver.select(col("Response ID"), col("Is_Invalid"))
      .as[(String, String)].collect().toMap
    assert(flags("1") == "Valid")
    assert(flags("2") == "Valid") // admin "ok" overrides Partial
    assert(flags("3") == "Survey status is partially completed")
    assert(flags("4") == "Disqualified in Alchemer")
    assert(flags("5") == "Survey status is Abandoned")
    assert(flags("6") == "Survey was submitted via test link")
    assert(flags("7") == "IP address outside USA")
    assert(flags("Offline #501") == "Valid")
  }

  test("gold rollup goldens: counts, excl-Unknown totals, % strings") {
    val (valid, invalid) = Gold.validSplit(silver)
    assert(valid.count() == 7 && invalid.count() == 5)
    val roll = Gold.rollup(valid, cfg)
    val gender = roll.filter(col("Demographic") === "Gender").collect()
      .map(r => r.getAs[String]("Category") -> r).toMap
    assert(gender("Male").getAs[Long]("# of Survey Responses") == 1L)
    assert(gender("Female").getAs[Long]("# of Survey Responses") == 3L)
    assert(gender("Unknown").getAs[Long]("# of Survey Responses") == 2L)
    assert(gender("Male").getAs[String]("Total Responses") == "5")
    assert(gender("Unknown").getAs[String]("Total Responses") == "")
    assert(gender("Female").getAs[String]("% of Survey Responses") == "60.00%")
    assert(gender("Unknown").getAs[String]("% of Survey Responses") == "40.00%")
  }

  test("census merge goldens: statuses, fills, threshold edge, date stamp") {
    val (valid, _) = Gold.validSplit(silver)
    val roll = Gold.rollup(valid, cfg)
    val census = readCsv("census.csv")
    val merged = CensusMerge.merge(census, roll, silver, cfg)
    val rows = merged.collect().map(r =>
      (r.getAs[String]("Demographic"), r.getAs[String]("Category")) -> r).toMap

    val male = rows(("Gender", "Male"))
    assert(male.getAs[String]("Representation Status") == "Under-Represented")
    assert(male.getAs[String]("% Difference") == "-28.0%")
    assert(male.getAs[Double]("Additional Responses Needed") == 0.0)

    val female = rows(("Gender", "Female"))
    assert(female.getAs[String]("Representation Status") == "Over-Represented")
    assert(female.getAs[String]("% of Survey Responses") == "60.0%")

    val unknown = rows(("Gender", "Unknown"))
    assert(unknown.getAs[String]("Representation Status") == "Over-Represented")
    assert(unknown.isNullAt(unknown.fieldIndex("Additional Responses Needed")))

    // census-only category: zero-filled counts, total from window peer
    val nonbinary = rows(("Gender", "Nonbinary"))
    assert(nonbinary.getAs[Long]("# of Survey Responses") == 0L)
    assert(nonbinary.getAs[String]("Total Responses") == "5")
    assert(nonbinary.getAs[String]("Representation Status") == "Looks Good")

    // diff exactly at the +5 threshold → no status (reference CASE falls through)
    val age3044 = rows(("Age", "30 to 44 years old"))
    assert(age3044.getAs[String]("% Difference") == "5.0%")
    assert(age3044.getAs[String]("Representation Status") == null)

    // rollup-only row: census side null
    val age1017 = rows(("Age", "10 to 17 years old"))
    assert(age1017.getAs[String]("% of Population (Census)") == null)

    assert(male.getAs[String]("Data Last Updated") == "02/01/2026")
  }
}
