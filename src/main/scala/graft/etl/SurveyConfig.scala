package graft.etl

/** Config-as-data for the community-survey pipeline: every rename/drop/
  * recode vocabulary the reference loads from spreadsheets at runtime
  * (ref utils.py:14-119) lives here as plain data, with the Kingston
  * defaults as the canonical instance. The engine stages are pure
  * `DataFrame => DataFrame` functions parameterized by this config.
  */
final case class SurveyConfig(
    city: String,
    /** column_in_csv -> standard_column_name (ref utils.py:51-53) */
    colsToRename: Map[String, String],
    /** columns dropped at the end of silver (ref utils.py:59) */
    colsToDelete: Seq[String],
    /** domain score column -> its likert question columns (ref utils.py:65-89) */
    likertColumnsDict: Seq[(String, Seq[String])],
    /** open-text columns subject to null-phrase scrubbing (ref utils.py:97) */
    openTextFields: Seq[String],
    /** responses meaning "no answer" (ref utils.py:103-106 — note the
      * adjacent-string-literal artifact "nada mas que agregarnot really" is
      * preserved as ONE phrase, so a bare "not really" is NOT nulled) */
    nullPhrases: Seq[String],
    /** (column, display name) pairs rolled up in gold (ref utils.py:112-119) */
    demographics: Seq[(String, String)],
    /** representation thresholds (ref utils.py:31-32) */
    representationNegative: Double,
    representationPositive: Double) {

  def likertColumns: Seq[String] = likertColumnsDict.flatMap(_._2)
}

object SurveyConfig {

  /** Likert response scoring (ref utils.py:170-176); unknowns map to 0. */
  val LikertMapping: Map[String, Int] = Map(
    "No change" -> 0,
    "A little better" -> 1,
    "A lot better" -> 2,
    "A little worse" -> -1,
    "A lot worse" -> -2)

  val kingston: SurveyConfig = SurveyConfig(
    city = "kingston",
    colsToRename = Map.empty, // spreadsheet-driven in the reference; data, not code
    colsToDelete = Seq.empty,
    likertColumnsDict = Seq(
      "5DW Score: Safety" -> Seq("Safety: Impact my safety"),
      "5DW Score: Relevant Resources" -> Seq(
        "Resources: Information and opportunities",
        "Resources: Food, sleep, housing",
        "Resources: Ability to pay my bills",
        "Resources: Ability to have fun"),
      "5DW Score: Mastery" -> Seq(
        "Mastery: Skill and confidence",
        "Mastery: Control and choice",
        "Mastery: Rights are protected"),
      "5DW Score: Social Connectedness" -> Seq(
        "Social: Feeling I belong here",
        "Social: Connect with people",
        "Social: Take care of people",
        "Social: Knowledge that I matter"),
      "5DW Score: Stability" -> Seq(
        "Stability: Stick to my routines",
        "Stability: Things are about to fall apart",
        "Stability: Deal with life hassles")),
    openTextFields = Seq.empty,
    nullPhrases = Seq(
      "na", "n/a", "not applicable", "no response", "does not apply",
      "no thank you", "no thanks", "no comment", "it dont", "none",
      "i have no idea", "no idea", "no time", "no realmente",
      "nada mas que agregarnot really", // preserved concatenation artifact
      "nothing", "-", "", "i not to say", "nope", "no", "no I do not",
      "nothings", "nan"),
    demographics = Seq(
      "Gender" -> "Gender",
      "Age" -> "Age",
      "Race/Ethnicity" -> "Race/Ethnicity",
      "Household Income" -> "Household Income",
      "Survey Language" -> "Language",
      "CM Name" -> "CM Name"),
    representationNegative = -5,
    representationPositive = 5)
}
