package graft

import graft.etl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants from SURVEY.md §5.4, run over randomized
  * survey frames (few cases — each case is a Spark job). */
object SurveyProperties extends Properties("survey") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val cfg = SurveyConfig.kingston

  private val genderPool = Gen.oneOf(
    "Male", "Female", "Non-binary", "Write In", "Prefer not to say", "", "junk")
  private val agePool = Gen.oneOf("-5", "0", "7", "15", "25", "40", "50",
    "65", "80", "119", "120", "999", "abc", "")
  private val incomePool = Gen.oneOf("Less than $20,000", "$20,000 to $49,999",
    "$50,000 to $99,999", "$100,000 or more",
    "I prefer not to answer this question", "", "weird")
  private val racePool = Gen.oneOf("White", "Black or African American",
    "Some other race (please write it in here)",
    "I prefer not to answer this question", "", "Asian")
  private val hispPool = Gen.oneOf("Yes", "No", "I prefer not to answer this question", "")

  private case class R(gender: String, age: String, income: String,
      race: String, hisp: String)

  private val genRow: Gen[R] = for {
    g <- genderPool; a <- agePool; i <- incomePool; r <- racePool; h <- hispPool
  } yield R(g, a, i, r, h)

  private val genRows: Gen[List[R]] = Gen.nonEmptyListOf(genRow)

  private def silverOf(rows: List[R]): DataFrame = {
    val df = rows.zipWithIndex.map { case (r, i) =>
      (i.toString, "Complete", null: String, "Live link", "United States",
        r.gender, r.age, r.hisp, r.race, r.income, "English", "CM A",
        "01/10/2026 9:00:00 AM", "01/10/2026 9:30:00 AM")
    }.toDF("Response ID", "Survey Completed?", "Alchemer Admin Comments",
      "Survey Link Used", "IP Address - Country", "Gender", "Age",
      "Hispanic or Latinx", "Race/Ethnicity", "Household Income",
      "Survey Language", "CM Name", "Time Started", "Survey Date Submitted")
    Silver.transform(df, cfg)
  }

  property("recodes are total functions: demographics never end up null") =
    forAll(genRows) { rows =>
      val s = silverOf(rows)
      val nulls = s.filter(
        col("Gender").isNull || col("Age").isNull ||
          col("Household Income").isNull || col("Race/Ethnicity").isNull ||
          col("CM Name").isNull).count()
      nulls == 0L
    }

  property("each demographic's rollup counts sum to the valid row count") =
    forAll(genRows) { rows =>
      val s = silverOf(rows)
      val (valid, _) = Gold.validSplit(s)
      val n = valid.count()
      val roll = Gold.rollup(valid, cfg)
      val sums = roll.groupBy("Demographic")
        .agg(sum(col("# of Survey Responses")).as("s"))
        .select("s").as[Long].collect()
      sums.forall(_ == n)
    }

  property("single-pass rollup equals the per-demographic union") =
    forAll(genRows) { rows =>
      val s = silverOf(rows)
      val (valid, _) = Gold.validSplit(s)
      val singlePass = Gold.rollup(valid, cfg)
        .collect().map(_.toSeq).toSet
      val perDem = cfg.demographics
        .map { case (c, n) => Gold.processDemographic(valid, c, n) }
        .map(_.select(Gold.FinalColumns.map(col): _*))
        .reduce(_ unionByName _)
        .collect().map(_.toSeq).toSet
      singlePass == perDem
    }

  property("% of survey responses sums to ~100 over non-Unknown categories") =
    forAll(genRows) { rows =>
      val s = silverOf(rows)
      val (valid, _) = Gold.validSplit(s)
      val gender = Gold.processDemographic(valid, "Gender", "Gender")
      val nonUnknown = gender.filter(col("Category") =!= "Unknown")
      if (nonUnknown.count() == 0) true
      else {
        val total = nonUnknown
          .select(regexp_replace(col("% of Survey Responses"), "%", "")
            .cast("double")).as[Double].collect().sum
        math.abs(total - 100.0) < 0.5
      }
    }

  property("representation status partitions correctly at the ±5 thresholds") =
    forAll(Gen.chooseNum(-30.0, 30.0)) { diff =>
      val rounded = math.rint(diff * 10) / 10 // census %s carry one decimal
      val census = Seq(("Gender", "Male", s"${10.0}%", 1))
        .toDF("Demographic", "Category", "Census %", "Display Order")
      val rollup = Seq(("Gender", "Male", 1L, s"${10.0 + rounded}%", "1"))
        .toDF("Demographic", "Category", "# of Survey Responses",
          "% of Survey Responses", "Total Responses")
      val out = CensusMerge.merge(census, rollup, silverOf(List(R("Male", "30",
        "$100,000 or more", "White", "No"))), cfg)
      val status = out.select("Representation Status").collect()(0).getString(0)
      val d = out.select(regexp_replace(col("% Difference"), "%", "")
        .cast("double")).collect()(0).getDouble(0)
      if (d < -5) status == "Under-Represented"
      else if (d > 5) status == "Over-Represented"
      else if (d > -5 && d < 5) status == "Looks Good"
      else status == null // exactly ±5 falls through (reference CASE)
    }
}
