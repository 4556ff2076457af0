package graft.etl

import org.apache.spark.sql.SparkSession

/** Per-stage config fetch semantics (ref utils.py:43-46): each reference
  * notebook task re-reads its spreadsheet config AT TASK START — config is
  * never memoized across stages, so an edit landing between the extract
  * and the transform is picked up by the transform. The engine's
  * equivalent: [[load]] re-reads the rename map from its CSV every call,
  * and [[stage]] makes the contract explicit — a fresh config is fetched
  * when the stage RUNS, not when the pipeline was wired up. Config frames
  * are spreadsheet-sized (tens of rows), so the per-stage `collect()` is
  * a bounded model artifact, never a data-sized driver pull.
  */
object ConfigSource {

  /** Read the column-rename map fresh from `dir/config_renames.csv`
    * (two columns: from,to — header row). */
  def renames(spark: SparkSession, dir: String): Map[String, String] =
    spark.read.option("header", "true").csv(s"$dir/config_renames.csv")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** A [[SurveyConfig]] whose spreadsheet-driven parts are re-read from
    * `dir` at THIS call. */
  def load(spark: SparkSession, dir: String): SurveyConfig =
    SurveyConfig.kingston.copy(colsToRename = renames(spark, dir))

  /** Run one pipeline stage under a freshly-fetched config. Stages
    * composed as `stage(s, dir)(cfg => ...)` each observe the config as
    * of their own start time — the reference's cross-task semantics. */
  def stage[T](spark: SparkSession, dir: String)(f: SurveyConfig => T): T =
    f(load(spark, dir))
}
