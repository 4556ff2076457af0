package graft

import graft.etl.ConfigSource

/** Pins the reference's cross-task config semantics (ref utils.py:43-46):
  * config is fetched when a stage RUNS, not when the pipeline was wired —
  * an edit landing between two stages is observed by the second one.
  */
class ConfigSourceSpec extends SparkSpec {

  private def writeConfig(dir: java.nio.file.Path, rows: (String, String)*): Unit = {
    val body = ("from,to" +: rows.map { case (a, b) => s"$a,$b" }).mkString("\n")
    java.nio.file.Files.writeString(dir.resolve("config_renames.csv"), body)
    ()
  }

  test("each stage observes the config as of its own start") {
    val dir = java.nio.file.Files.createTempDirectory("graft-config")
    writeConfig(dir, "Q5: Gender" -> "Gender")
    val first = ConfigSource.stage(spark, dir.toString)(_.colsToRename)
    assert(first == Map("Q5: Gender" -> "Gender"))
    // the mid-pipeline edit: second stage must see it, not a memo of v1
    writeConfig(dir, "Q5: Gender" -> "Gender", "Q9: Age" -> "Age")
    val second = ConfigSource.stage(spark, dir.toString)(_.colsToRename)
    assert(second == Map("Q5: Gender" -> "Gender", "Q9: Age" -> "Age"))
  }
}
